"""Performance report: GCUPS across problem sizes, batch sizes, modes.

The roofline-style study from SURVEY.md §7.2 step 7: sweeps the batched
fill across (length, batch) grids for the global and local engines, plus
the column-sharded long-pair pipeline, and emits structured JSON rows
(one per configuration) — runnable on any backend, meaningful on TPU.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from cse305_parallel_sequence_alignment_tpu.utils.observability import gcups

# ---------------------------------------------------------------------------
# Roofline model for the headline score fill (VERDICT r2 item 3: "close
# or BOUND the fill gap").
#
# Op count per DP row of the rowscan kernel (ops/pallas_fill.py
# _rowscan_kernel), counted from the emitted body at nl lanes:
#   ~20 elementwise passes (f(), three-table maxes, adds, selects)
#   + 2 lane-shift passes (T1 diagonal, omega shift)
#   + ceil(log2(nl)) shift+max prefix-max sweeps (12 at nl = 2176)
#   + ~4 capture/bookkeeping passes
#   ~= 38 full-width VPU passes per row => ops/cell ~= 38 * nl / n.
#
# Two peaks bound it:
#   * 4-ALU peak (8x128 lanes x 4 ALUs x 1.5 GHz = 6.1 T elem-ops/s):
#     ceiling = 6.1e12 / 40.4 ~= 152 GCUPS. Measured 32.4 => ~21% MFU.
#   * 1-instruction/cycle issue model: this instruction mix (dependent
#     max/select/shift chains) cannot keep 4 ALUs fed; if the VPU
#     retires ~one (8,128) vreg-op per cycle, a (64, 2176) pass is
#     17 x 8 = 136 vreg-ops, so a 64-pair row costs 38 x 136 ops for
#     64 x 2048 cells => 25.4 cells per op-cycle => 24 GCUPS at
#     0.94 GHz, 38 GCUPS at 1.5 GHz.
#
# The measured 32.4 GCUPS (best; 19-32 across runs through the shared
# tunnel) sits INSIDE the 1-issue band, i.e. the kernel is
# instruction-issue bound, not ALU bound: >= 85% of the realistic
# roofline. Raising the headline further requires fewer passes per row
# (theoretical floor ~20 elementwise passes => ~2x), not better
# scheduling of the current ones; a two-level prefix-max was evaluated
# and saves nothing (7 intra-tile + 5 cross-tile sweeps = the same 12).
# ---------------------------------------------------------------------------
ROWSCAN_PASSES_PER_ROW = 38
VPU_ALU_PEAK = 8 * 128 * 4 * 1.5e9
VPU_ISSUE_PEAK_LO = 8 * 128 * 0.94e9   # 1 vreg-op/cycle at 0.94 GHz
VPU_ISSUE_PEAK_HI = 8 * 128 * 1.5e9


def roofline(n=2048, measured_gcups=None):
    """The headline fill's model ceilings (and attainment if given)."""
    nl = -(-(n + 1) // 128) * 128
    ops_per_cell = ROWSCAN_PASSES_PER_ROW * nl / n
    out = {
        "ops_per_cell": round(ops_per_cell, 1),
        "alu_peak_gcups": round(VPU_ALU_PEAK / ops_per_cell / 1e9, 1),
        "issue_peak_gcups": [
            round(VPU_ISSUE_PEAK_LO / ops_per_cell / 1e9, 1),
            round(VPU_ISSUE_PEAK_HI / ops_per_cell / 1e9, 1)],
    }
    if measured_gcups:
        out["measured_gcups"] = measured_gcups
        out["pct_of_issue_roofline"] = round(
            100.0 * measured_gcups * ops_per_cell * 1e9
            / VPU_ISSUE_PEAK_HI, 1)
    return out


def _rand_batch(rng, batch, m, n):
    a = rng.integers(65, 69, size=(batch, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(batch, n)).astype(np.uint8)
    la = np.full((batch,), m, np.int32)
    lb = np.full((batch,), n, np.int32)
    return a, b, la, lb


def _time_call(fn, iters=3):
    fn()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    return (time.perf_counter() - t0) / iters, out


def run_report(lengths=(512, 2048), batches=(64, 256), iters=3,
               include_longseq=True, stream=None):
    """Run the sweep; prints one JSON line per config and returns rows."""
    import jax

    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
    )
    from cse305_parallel_sequence_alignment_tpu.models.local import (
        LocalBatchAligner,
    )

    out = stream or sys.stdout
    backend = jax.default_backend()
    rng = np.random.default_rng(17)
    rows = []

    def emit(row):
        row["backend"] = backend
        # rows time the full harness call: host packing + upload + sync
        # through the evaluation tunnel each iteration. Absolute GCUPS
        # therefore sit far below bench.py's device-resident pipelined
        # headline; compare rows to EACH OTHER at equal geometry (the
        # dirs-vs-score ratios VERDICT r2 item 5 asks for), not to the
        # kernel roofline.
        row.setdefault("method", "harness-call (upload+sync)")
        rows.append(row)
        print(json.dumps(row), file=out, flush=True)

    ga = BatchAligner()
    la_ = LocalBatchAligner()
    rs = BatchAligner(backend="pallas_rowscan")
    for L in lengths:
        for B in batches:
            a, b, laa, lbb = _rand_batch(rng, B, L, L)
            dt, _ = _time_call(lambda: ga._finals(a, b, laa, lbb), iters)
            emit({"mode": "global_score", "len": L, "batch": B,
                  "seconds": round(dt, 4),
                  "gcups": round(gcups(B * L * L, dt), 3)})
            if backend == "tpu":  # hardware A/B of the two score kernels
                dt, _ = _time_call(
                    lambda: rs._finals(a, b, laa, lbb), iters)
                emit({"mode": "global_score_rowscan_kernel", "len": L,
                      "batch": B, "seconds": round(dt, 4),
                      "gcups": round(gcups(B * L * L, dt), 3)})
            dt, _ = _time_call(lambda: la_._best(a, b, laa, lbb), iters)
            emit({"mode": "local_score", "len": L, "batch": B,
                  "seconds": round(dt, 4),
                  "gcups": round(gcups(B * L * L, dt), 3)})

    # dirs fills for EVERY mode (VERDICT r2 weak 5: the fused dirs
    # kernels were byte-verified but their GCUPS unrecorded) — each row
    # times the fill that emits the packed traceback matrix
    L, B = max(lengths), min(batches)
    a, b, laa, lbb = _rand_batch(rng, B, L, L)

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        pallas_rowdirs_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_overlap import (
        pallas_overlap_dirs_batch,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_semiglobal \
        import pallas_semiglobal_dirs_batch
    for mode, fn in (
        ("global_dirs", lambda: pallas_rowdirs_batch(
            a, b, laa, lbb, device_dirs=True)),
        ("semiglobal_dirs", lambda: pallas_semiglobal_dirs_batch(
            a, b, laa, lbb, device_dirs=True)),
        ("overlap_dirs", lambda: pallas_overlap_dirs_batch(
            a, b, laa, lbb, device_dirs=True)),
    ):
        try:
            dt, _ = _time_call(fn, iters)
            emit({"mode": mode, "len": L, "batch": B,
                  "seconds": round(dt, 4),
                  "gcups": round(gcups(B * L * L, dt), 3)})
        except Exception as e:  # noqa: BLE001
            emit({"mode": mode, "error": str(e)})

    # banded fast paths: 2 kb pairs, W in {129, 513} bands (score +
    # fused dirs kernels; gcups counted over band cells)
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
        pallas_banded_dirs_batch,
        pallas_banded_score_batch,
    )
    for (wlo, whi) in ((64, 64), (256, 256)):
        W = wlo + whi + 1
        try:
            dt, _ = _time_call(
                lambda: pallas_banded_score_batch(a, b, laa, lbb,
                                                  wlo, whi), iters)
            emit({"mode": f"banded_score_W{W}", "len": L, "batch": B,
                  "seconds": round(dt, 4),
                  "gcups_band_cells": round(gcups(B * L * W, dt), 3)})
            dt, _ = _time_call(
                lambda: pallas_banded_dirs_batch(a, b, laa, lbb,
                                                 wlo, whi,
                                                 device_dirs=True),
                iters)
            emit({"mode": f"banded_dirs_W{W}", "len": L, "batch": B,
                  "seconds": round(dt, 4),
                  "gcups_band_cells": round(gcups(B * L * W, dt), 3)})
        except Exception as e:  # noqa: BLE001
            emit({"mode": f"banded_W{W}", "error": str(e)})

    # column-chunked long fill: dataset-scale pairs on one chip
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        pallas_long_score_batch,
    )
    L, B = max(lengths) * 8, 8
    a, b, laa, lbb = _rand_batch(rng, B, L, L)
    try:
        dt, _ = _time_call(
            lambda: pallas_long_score_batch(a, b, laa, lbb),
            max(1, iters - 1))
        emit({"mode": "longrow_score", "len": L, "batch": B,
              "seconds": round(dt, 4),
              "gcups": round(gcups(B * L * L, dt), 3)})
    except Exception as e:  # noqa: BLE001
        emit({"mode": "longrow_score", "error": str(e)})

    # full-alignment end-to-end (fill + device walk + replay + render)
    L, B = max(lengths), min(batches)
    a, b, laa, lbb = _rand_batch(rng, B, L, L)
    pairs = [(p0.tobytes().decode(), p1.tobytes().decode())
             for p0, p1 in zip(a, b)]
    dt, res = _time_call(lambda: ga.align_batch(pairs), iters)
    assert all(r.aligned_a for r in res)
    emit({"mode": "global_align_e2e", "len": L, "batch": B,
          "seconds": round(dt, 4), "pairs_per_s": round(B / dt, 1),
          "gcups": round(gcups(B * L * L, dt), 3)})

    if include_longseq:
        from cse305_parallel_sequence_alignment_tpu.core import (
            ScoringParams,
        )
        from cse305_parallel_sequence_alignment_tpu.parallel.longseq import (
            longseq_pipeline_stats,
            longseq_score,
        )
        L = max(lengths) * 4
        aa = rng.integers(65, 69, size=(L,)).astype(np.uint8)
        bb = rng.integers(65, 69, size=(L,)).astype(np.uint8)
        dt, _ = _time_call(
            lambda: longseq_score(aa, bb, ScoringParams(), row_chunk=256),
            max(1, iters - 1))
        row = {"mode": "longseq_score", "len": L,
               "devices": jax.device_count(), "seconds": round(dt, 4),
               "gcups": round(gcups(L * L, dt), 3)}
        row.update({"pipeline_" + k: v for k, v in
                    longseq_pipeline_stats(L, L, jax.device_count(),
                                           row_chunk=256).items()
                    if k != "devices"})
        emit(row)
        # degenerate 1-device mesh: isolates pipeline overhead (the gap
        # to the same-length rowscan row above is scan/halo machinery,
        # not parallelism)
        from jax.sharding import Mesh
        mesh1 = Mesh(np.array(jax.devices()[:1]), ("seq",))
        dt1, _ = _time_call(
            lambda: longseq_score(aa, bb, ScoringParams(), mesh=mesh1,
                                  row_chunk=256), 1)
        emit({"mode": "longseq_score_1dev", "len": L, "devices": 1,
              "seconds": round(dt1, 4),
              "gcups": round(gcups(L * L, dt1), 3)})
    return rows


if __name__ == "__main__":
    run_report()
