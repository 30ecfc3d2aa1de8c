"""Round-4: unroll sweep on the full-precision rowscan2 (pin interleaved).

The prefix ablation showed op removal barely moves throughput while
unroll moved with it — if per-loop-iteration overhead dominates, deeper
unroll is a correctness-preserving speedup. Run after fixing nothing:
    python scripts/probes/ab_unroll_r4.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _pallas_rowscan,
        _pallas_rowscan2,
        rowscan_prep,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    batch, m, n = 256, 2048, 2048
    a = rng.integers(65, 69, size=(batch, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(batch, n)).astype(np.uint8)
    la = np.full((batch,), m, np.int32)
    lb = np.full((batch,), n, np.int32)
    cells = batch * m * n
    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1,
              interpret=False)

    args7, meta7 = rowscan_prep(a, b, la, lb, block_b=64, carries=7)
    dev7 = [jnp.asarray(x) for x in args7]
    args5, meta5 = rowscan_prep(a, b, la, lb, block_b=64, carries=5)
    dev5 = [jnp.asarray(x) for x in args5]
    pin = lambda: _pallas_rowscan(*dev7, **kw, **meta7)  # noqa: E731

    def timed(fn, iters=6):
        for _ in range(2):
            np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        return cells / ((time.perf_counter() - t0) / iters) / 1e9

    t0 = time.perf_counter()
    np.asarray(pin())
    print(f"pin compiled {time.perf_counter()-t0:.1f}s", flush=True)

    ref_out = None
    for unr in (4, 8, 16, 32, 64):
        try:
            fn = lambda: _pallas_rowscan2(  # noqa: E731
                *dev5, **kw, **meta5, unroll=unr)
            t0 = time.perf_counter()
            out = np.asarray(fn())
            ct = time.perf_counter() - t0
            if ref_out is None:
                ref_out = out
            ok = bool(np.array_equal(out, ref_out))
            g = timed(fn)
            gp = timed(pin)
            print(json.dumps({"kind": "unroll", "unroll": unr,
                              "compile_s": round(ct, 1),
                              "gcups": round(g, 2),
                              "pin_gcups": round(gp, 2),
                              "cells_equal": ok}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kind": "unroll", "unroll": unr,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
