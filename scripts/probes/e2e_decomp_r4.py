"""Round-4 e2e decomposition: where do the 145 ms/chunk go?

Times each stage of the fused align_batch path separately on-chip:
  - rowcb dirs16+runs fill alone (device, pipelined)
  - rowcb score-only fill (same geometry) -> dirs overhead
  - fused fill+walk dispatch (device, pipelined)  -> walk overhead
  - collect (fetch + C++ replay + render)          -> host cost
  - align_batch steady state at several chunk sizes
Run: python scripts/probes/e2e_decomp_r4.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
        _fused_fill_walk,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _pallas_rowcb,
        rowcb_prep,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    B, m, n = 128, 2048, 2048
    a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
    la = np.full((B,), m, np.int32)
    lb = np.full((B,), n, np.int32)
    cells = B * m * n

    def emit(**row):
        print(json.dumps(row), flush=True)

    def timed(fn, sync, iters=4, flight=2):
        outs = [fn() for _ in range(2)]
        for o in outs:
            sync(o)
        t0 = time.perf_counter()
        pend = []
        for _ in range(iters):
            pend.append(fn())
            while len(pend) > flight - 1:
                sync(pend.pop(0))
        for o in pend:
            sync(o)
        return (time.perf_counter() - t0) / iters

    args, meta = rowcb_prep(a, b, la, lb, carries=11)
    dev = [jnp.asarray(x) for x in args]
    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False,
              k_steps=2, **meta)

    for name, wd, wr in (("rowcb_score", False, False),
                         ("rowcb_dirs16runs", True, True),
                         ("rowcb_dirs8", True, False)):
        try:
            fn = lambda: _pallas_rowcb(  # noqa: E731
                *dev, want_dirs=wd, with_runs=wr, **kw)
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ct = time.perf_counter() - t0
            dt = timed(fn, lambda o: np.asarray(o[1][:1, :1]))
            emit(kind=name, compile_s=round(ct, 1),
                 ms=round(dt * 1e3, 1),
                 gcups=round(cells / dt / 1e9, 2))
        except Exception as e:  # noqa: BLE001
            emit(kind=name, error=str(e)[:200])

    # fused fill+walk: device time of the whole dispatch
    al = BatchAligner()
    try:
        fn = lambda: al._dispatch_fused(a, b, la, lb)  # noqa: E731
        h0 = fn()
        jax.block_until_ready(h0[1])
        dt = timed(fn, lambda h: jax.block_until_ready(h[1]))
        emit(kind="fused_dispatch_device", ms=round(dt * 1e3, 1),
             gcups=round(cells / dt / 1e9, 2))

        # collect cost (host replay + render) on a ready chunk
        h1 = fn()
        jax.block_until_ready(h1[1])
        t0 = time.perf_counter()
        chains, arrays, tables, scores = al._collect_fused(
            h1, la, lb, "parity", None, list(range(B)))
        emit(kind="collect_fused_host",
             ms=round((time.perf_counter() - t0) * 1e3, 1))
        # render cost
        enc_a = [r for r in a]
        t0 = time.perf_counter()
        from cse305_parallel_sequence_alignment_tpu.native import walker
        tt, ii, jj, lens = arrays
        cnt = 0
        for r in range(B):
            L = int(lens[r])
            out = walker.render(a[r], b[r], tt[r, :L], ii[r, :L],
                                jj[r, :L])
            cnt += out is not None
        emit(kind="render_host", ms=round(
            (time.perf_counter() - t0) * 1e3, 1), native=cnt)
    except Exception as e:  # noqa: BLE001
        emit(kind="fused", error=str(e)[:300])

    # align_batch steady state at several chunk sizes
    pairs = [(p0.tobytes().decode(), p1.tobytes().decode())
             for p0, p1 in zip(a, b)]
    for total in (128, 256, 512):
        ps = (pairs * (total // B))[:total]
        al2 = BatchAligner()
        al2.align_batch(ps[: min(64, total)])  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = al2.align_batch(ps)
            ts.append(time.perf_counter() - t0)
        assert all(r.aligned_a for r in res)
        dt = sum(ts) / len(ts)
        emit(kind="align_batch", total=total,
             pairs_per_s=round(total / dt, 1),
             ms=round(dt * 1e3, 1),
             spread_pct=round(100 * (max(ts) - min(ts)) / dt, 1))


if __name__ == "__main__":
    main()
