"""Round-4 A/B: 2-carry rowscan2 vs pinned rowscan, same process.

Interleaved timed segments against the pinned round-3 kernel so the
chip lottery cancels (CLAUDE.md ground rule). Also sweeps block_b for
the winner. Run: python scripts/probes/ab_rowscan2_r4.py [iters]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax
    import jax.numpy as jnp

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _pallas_rowscan,
        _pallas_rowscan2,
        rowscan_prep,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    batch, m, n = 256, 2048, 2048
    a = rng.integers(65, 69, size=(batch, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(batch, n)).astype(np.uint8)
    la = np.full((batch,), m, np.int32)
    lb = np.full((batch,), n, np.int32)
    cells = batch * m * n

    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1,
              interpret=False)

    def prep(block_b, carries):
        args, meta = rowscan_prep(a, b, la, lb, block_b=block_b,
                                  carries=carries)
        dev = [jnp.asarray(x) for x in args]
        return dev, meta

    def timed(fn):
        outs = [fn() for _ in range(2)]
        for o in outs:
            np.asarray(o)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        return cells / ((time.perf_counter() - t0) / iters) / 1e9

    dev64, meta64 = prep(64, 7)
    dev64b, meta64b = prep(64, 5)
    variants = {
        "rowscan_b64(pin)": lambda: _pallas_rowscan(
            *dev64, **kw, **meta64),
        "rowscan2_b64": lambda: _pallas_rowscan2(
            *dev64b, **kw, **meta64b),
    }
    # compile first (sequential, ~2.5 s each)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        np.asarray(fn())
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)

    # 3 interleaved rounds
    rows = []
    for rnd in range(3):
        for name, fn in variants.items():
            g = timed(fn)
            rows.append({"round": rnd, "kernel": name,
                         "gcups": round(g, 2)})
            print(json.dumps(rows[-1]), flush=True)

    # block_b sweep for rowscan2 (128 exceeds the default 12 MB VMEM
    # budget; raise it for the probe to see if Mosaic accepts and wins)
    import cse305_parallel_sequence_alignment_tpu.ops.pallas_fill as pf
    orig_fit = pf._fit_block_b
    for bb in (32, 128):
        try:
            if bb == 128:
                pf._fit_block_b = (
                    lambda b, l, budget_bytes=(14 << 20): orig_fit(
                        b, l, budget_bytes))
            else:
                pf._fit_block_b = orig_fit
            devx, metax = prep(bb, 5)
            fn = lambda: _pallas_rowscan2(*devx, **kw, **metax)  # noqa: E731
            t0 = time.perf_counter()
            np.asarray(fn())
            ct = time.perf_counter() - t0
            g = timed(fn)
            g_pin = timed(variants["rowscan_b64(pin)"])
            print(json.dumps({"kernel": f"rowscan2_b{bb}",
                              "fitted_block": metax["block_b"],
                              "compile_s": round(ct, 1),
                              "gcups": round(g, 2),
                              "pin_gcups": round(g_pin, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": f"rowscan2_b{bb}",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
