"""One-shot TPU validation + benchmark: run when a real chip is attached.

Order: correctness of every Pallas kernel against the pure-JAX fills on
device, then reference-parity spot checks, then the GCUPS sweep and the
headline bench. Exits nonzero on any mismatch. Run:

    python scripts/tpu_validate.py            # full
    python scripts/tpu_validate.py --quick    # correctness only
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    quick = "--quick" in sys.argv
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor an explicit CPU request over the site hook's TPU override
        jax.config.update("jax_platforms", "cpu")

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)
    if backend != "tpu":
        print("WARNING: not running on TPU", flush=True)

    from cse305_parallel_sequence_alignment_tpu.models.local_oracle import (
        LOCAL_PARAMS,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        pallas_dirs_batch,
        pallas_score_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_local import (
        pallas_sw_dirs_batch,
        pallas_sw_score_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_semiglobal \
        import pallas_semiglobal_score_batch
    from cse305_parallel_sequence_alignment_tpu.ops.local import (
        sw_score_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.semiglobal import (
        semiglobal_score_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.wavefront import (
        PAD_A,
        PAD_B,
        wavefront_score_batch,
    )

    rng = np.random.default_rng(3)
    B, bm, bn = 64, 192, 256
    a = np.full((B, bm), PAD_A, np.uint8)
    b = np.full((B, bn), PAD_B, np.uint8)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for k in range(B):
        la[k] = int(rng.integers(1, bm + 1))
        lb[k] = int(rng.integers(1, bn + 1))
        a[k, : la[k]] = rng.integers(65, 69, la[k])
        b[k, : lb[k]] = rng.integers(65, 69, lb[k])
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    jla, jlb = jnp.asarray(la), jnp.asarray(lb)

    failures = 0

    def check(name, got, want):
        nonlocal failures
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures += 1

    t0 = time.time()
    want = np.asarray(wavefront_score_batch(ja, jb, jla, jlb))
    for st in (-1, -2, 2):
        w = want if st == -1 else np.asarray(
            wavefront_score_batch(ja, jb, jla, jlb, start_type=st))
        got = pallas_score_batch(a, b, la, lb, start_type=st)
        check(f"pallas_score start={st}", got, w)
    finals, dirs = pallas_dirs_batch(a, b, la, lb)
    check("pallas_dirs finals", finals, want)
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        pallas_rowscan_score_batch,
    )
    got_rs2 = pallas_rowscan_score_batch(a, b, la, lb)
    check("pallas_rowscan_score", got_rs2, want)

    from cse305_parallel_sequence_alignment_tpu.ops.banded import (
        banded_score,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
        pallas_banded_score_batch,
    )
    wband = max(bm, bn)  # full-coverage band: equals unrestricted DP
    got_band = pallas_banded_score_batch(a, b, la, lb, wband, wband)
    kcheck = range(0, 8)  # XLA reference compiles per distinct shape
    want_band = np.stack([
        banded_score(a[k, : la[k]], b[k, : lb[k]], wband, wband)
        for k in kcheck])
    check("pallas_banded_score", got_band[list(kcheck)], want_band)

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        pallas_submat_score_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.wavefront import (
        wavefront_score_batch_matrix,
    )
    from cse305_parallel_sequence_alignment_tpu.utils.matrices import (
        BLOSUM62,
    )
    kk = BLOSUM62.k
    ac = np.where(a == PAD_A, kk, (a - 65) % kk).astype(np.uint8)
    bc = np.where(b == PAD_B, kk, (b - 65) % kk).astype(np.uint8)
    want_sm = np.asarray(wavefront_score_batch_matrix(
        jnp.asarray(ac), jnp.asarray(bc), jla, jlb,
        jnp.asarray(BLOSUM62.table()), g=1.0, h=2.0, start_type=-1,
        pad_code=kk))
    got_sm = pallas_submat_score_batch(ac, bc, la, lb, BLOSUM62.table(),
                                       g=1.0, h=2.0)
    check("pallas_submat_score (blosum62)", got_sm, want_sm)

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        pallas_long_score_batch,
    )
    got_lr = pallas_long_score_batch(a, b, la, lb, chunk_cols=128, rc=32)
    check("pallas_longrow (chunked)", got_lr, want)

    g, h, match, mismatch = LOCAL_PARAMS.astuple()
    want_sw = np.asarray(sw_score_batch(
        ja, jb, jla, jlb, g=g, h=h, match=match, mismatch=mismatch))
    got_sw = pallas_sw_score_batch(a, b, la, lb, g=g, h=h, match=match,
                                   mismatch=mismatch)
    check("pallas_sw_score", got_sw, want_sw)
    best2, _ = pallas_sw_dirs_batch(a, b, la, lb, g=g, h=h, match=match,
                                    mismatch=mismatch)
    check("pallas_sw_dirs best", best2, want_sw)

    want_sg = np.asarray(semiglobal_score_batch(
        ja, jb, jla, jlb, g=1.0, h=2.0, match=1.0, mismatch=-1.0))
    got_sg = pallas_semiglobal_score_batch(
        a, b, la, lb, g=1.0, h=2.0, match=1.0, mismatch=-1.0)
    check("pallas_semiglobal_score", got_sg, want_sg)

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        pallas_rowdirs_batch,
    )
    fin_rd, dirs_rd = pallas_rowdirs_batch(a, b, la, lb)
    check("pallas_rowdirs finals", fin_rd, want)
    sub = [(k, i) for k in range(0, B, 9)
           for i in range(1, int(la[k]) + 1, max(1, int(la[k]) // 7))]
    ok_rd = all(np.array_equal(
        np.asarray(dirs_rd[i, k, 1: int(lb[k]) + 1]),
        np.array([dirs[i + j, k, j] for j in range(1, int(lb[k]) + 1)]))
        for (k, i) in sub)
    check("pallas_rowdirs bytes vs skew", ok_rd, True)

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_semiglobal \
        import pallas_semiglobal_dirs_batch
    got_sgd, _ = pallas_semiglobal_dirs_batch(
        a, b, la, lb, g=1.0, h=2.0, match=1.0, mismatch=-1.0)
    check("pallas_semiglobal_dirs out", got_sgd, want_sg)

    from cse305_parallel_sequence_alignment_tpu.ops.banded import (
        banded_dirs,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
        pallas_banded_dirs_batch,
    )
    fin_bd, dirs_bd = pallas_banded_dirs_batch(
        a, b, la, lb, wband, wband)
    ok_bd = True
    # two pairs only: the XLA banded reference recompiles per (m, n)
    for k in (0, 37):
        wf, wd = banded_dirs(a[k, : la[k]], b[k, : lb[k]], wband, wband)
        ok_bd &= np.array_equal(fin_bd[k], wf)
        ok_bd &= np.array_equal(
            np.asarray(dirs_bd[: la[k] + 1, k, : 2 * wband + 1]), wd)
    check("pallas_banded_dirs vs xla", ok_bd, True)

    # --- round-3 kernels on real hardware ---
    from cse305_parallel_sequence_alignment_tpu.ops.overlap import (
        overlap_score_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_overlap import (
        pallas_overlap_dirs_batch,
    )
    want_ov = np.asarray(overlap_score_batch(ja, jb, jla, jlb))
    got_ov, _ = pallas_overlap_dirs_batch(a, b, la, lb)
    check("pallas_overlap_dirs out", got_ov, want_ov[:, :4])

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        pallas_rowcb_dirs_batch,
        pallas_rowcb_score_batch,
    )
    got_cb = pallas_rowcb_score_batch(a, b, la, lb)
    check("pallas_rowcb_score", got_cb, want)
    fin_cb, dirs_cb = pallas_rowcb_dirs_batch(a, b, la, lb,
                                              with_runs=False)
    check("pallas_rowcb_dirs finals", fin_cb, want)
    check("pallas_rowcb_dirs bytes vs rowdirs",
          np.array_equal(np.asarray(dirs_cb)[:, :B, :],
                         np.asarray(dirs_rd)[:dirs_cb.shape[0], :B, :]),
          True)
    fin_cb16, dirs_cb16 = pallas_rowcb_dirs_batch(a, b, la, lb,
                                                  with_runs=True)
    # code bits 0-5 match the plain byte; bits 6-7 hold the after-run
    # code since the round-4 8-bit run widening
    check("pallas_rowcb_dirs16 code bits",
          np.array_equal(np.asarray(dirs_cb16)[:, :B, :] & 0x3F,
                         np.asarray(dirs_cb)[:, :B, :].astype(np.uint16)),
          True)

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        batched_crossings,
        pallas_long_lastrow,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longstair \
        import stair_lastrow
    want_last = pallas_long_lastrow(a[0, : la[0]], b[0, : lb[0]],
                                    chunk_cols=128, rc=32)
    got_last = stair_lastrow(a[0, : la[0]], b[0, : lb[0]], nl_c=128,
                             rc=32)
    check("stair_lastrow vs longrow", got_last, want_last)

    from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
    from cse305_parallel_sequence_alignment_tpu.parallel.partition import (
        crossing_on_row,
    )
    tasks = [(a[k, : la[k]], b[k, : lb[k]], int(la[k]) // 2, st, en)
             for k, (st, en) in zip((1, 2, 3), ((-1, -1), (1, 2),
                                                (3, -1)))]
    got_bc = batched_crossings(tasks)
    got_bc_stair = batched_crossings(tasks[:2], stair_threshold=0)
    ok_bc = all(
        (j, t, s) == crossing_on_row(sa, sb, im, ScoringParams(), st, en)
        for (sa, sb, im, st, en), (j, t, s) in zip(tasks, got_bc))
    ok_bc &= all(
        (j, t, s) == crossing_on_row(sa, sb, im, ScoringParams(), st, en)
        for (sa, sb, im, st, en), (j, t, s) in zip(tasks[:2],
                                                   got_bc_stair))
    check("batched_crossings (longrow + stair) vs serial", ok_bc, True)
    print(f"correctness wall: {time.time() - t0:.1f}s", flush=True)

    # reference-parity spot check through the full batch pipeline
    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
    )
    from cse305_parallel_sequence_alignment_tpu.models.oracle import (
        oracle_align,
    )
    pairs = [("".join(rng.choice(list("ACGT"), 80)),
              "".join(rng.choice(list("ACGT"), 100))) for _ in range(8)]
    res = BatchAligner().align_batch(pairs)
    ok = all(r.aligned_a == oracle_align(x, y).aligned_a
             for (x, y), r in zip(pairs, res))
    check("batch align parity", ok, True)

    if failures:
        print(f"{failures} FAILURES", flush=True)
        return 1
    if quick:
        return 0

    from cse305_parallel_sequence_alignment_tpu.harness.perfreport import (
        run_report,
    )
    run_report(lengths=(512, 2048), batches=(64, 256))
    import subprocess
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True)
    print(out.stdout.decode().strip(), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
