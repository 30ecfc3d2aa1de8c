"""Round-4b: e2e with the 8-bit run encoding + compile-concurrency test.

Run: python scripts/probes/e2e_r4b.py
"""

import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _pallas_rowcb,
        rowcb_prep,
    )
    import jax.numpy as jnp

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
        for _ in range(2):
            sync(fn())
        t0 = time.perf_counter()
        pend = []
        for _ in range(iters):
            pend.append(fn())
            while len(pend) > flight - 1:
                sync(pend.pop(0))
        for o in pend:
            sync(o)
        return (time.perf_counter() - t0) / iters

    # reference: rowcb score fill (pin for this claim)
    args, meta = rowcb_prep(a, b, la, lb, carries=11)
    dev = [jnp.asarray(x) for x in args]
    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False,
              k_steps=2, **meta)
    fnp = lambda: _pallas_rowcb(  # noqa: E731
        *dev, want_dirs=False, with_runs=False, **kw)
    t0 = time.perf_counter()
    jax.block_until_ready(fnp())
    emit(kind="pin_compile_s", s=round(time.perf_counter() - t0, 1))
    dtp = timed(fnp, lambda o: np.asarray(o[1][:1, :1]))
    emit(kind="rowcb_score", ms=round(dtp * 1e3, 1),
         gcups=round(cells / dtp / 1e9, 2))

    al = BatchAligner()
    try:
        fn = lambda: al._dispatch_fused(a, b, la, lb)  # noqa: E731
        h0 = fn()
        jax.block_until_ready(h0[1])
        dt = timed(fn, lambda h: jax.block_until_ready(h[1]))
        emit(kind="fused_dispatch_device", ms=round(dt * 1e3, 1),
             gcups=round(cells / dt / 1e9, 2))
        h1 = fn()
        jax.block_until_ready(h1[1])
        t0 = time.perf_counter()
        chains, arrays, tables, scores = al._collect_fused(
            h1, la, lb, "parity", None, list(range(B)))
        emit(kind="collect_fused_host",
             ms=round((time.perf_counter() - t0) * 1e3, 1),
             chain0=len(chains[0]))
    except Exception as e:  # noqa: BLE001
        emit(kind="fused", error=str(e)[:300])

    # align_batch steady state (mean of 3)
    pairs = [(p0.tobytes().decode(), p1.tobytes().decode())
             for p0, p1 in zip(a, b)]
    for total in (256, 512):
        ps = (pairs * (total // B))[:total]
        al2 = BatchAligner()
        al2.align_batch(ps[:64])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = al2.align_batch(ps)
            ts.append(time.perf_counter() - t0)
        assert all(r.aligned_a for r in res)
        dt = sum(ts) / len(ts)
        emit(kind="align_batch", total=total,
             pairs_per_s=round(total / dt, 1),
             spread_pct=round(100 * (max(ts) - min(ts)) / dt, 1))

    # --- compile concurrency: 2 fresh variants, serial vs threaded ---
    def compile_variant(ks):
        f = _pallas_rowcb(*dev, want_dirs=False, with_runs=False,
                          **{**kw, "k_steps": ks})
        jax.block_until_ready(f)

    t0 = time.perf_counter()
    compile_variant(3)
    t_serial1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    compile_variant(5)
    t_serial2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    th = [threading.Thread(target=compile_variant, args=(ks,))
          for ks in (6, 7)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    t_par = time.perf_counter() - t0
    emit(kind="compile_concurrency", serial_each_s=[
        round(t_serial1, 1), round(t_serial2, 1)],
        two_threads_s=round(t_par, 1))


if __name__ == "__main__":
    main()
