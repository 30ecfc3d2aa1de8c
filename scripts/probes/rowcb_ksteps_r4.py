"""Round-4: rowcb dirs16+runs k_steps / block_b A/B (production dirs
kernel). Run: python scripts/probes/rowcb_ksteps_r4.py"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _pallas_rowcb,
        rowcb_prep,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    B, m, n = 256, 2048, 2048
    a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
    la = np.full((B,), m, np.int32)
    lb = np.full((B,), n, np.int32)
    cells = B * m * n

    def emit(**row):
        print(json.dumps(row), flush=True)

    def pipelined2(fn, sync, iters=5):
        prev = fn()
        sync(prev)
        t0 = time.perf_counter()
        prev = fn()
        for _ in range(iters - 1):
            cur = fn()
            sync(prev)
            prev = cur
        sync(prev)
        return (time.perf_counter() - t0) / iters

    ref = None
    pin_fn = None
    for ks, carries in ((2, 11), (4, 15), (8, 23)):
        try:
            args, meta = rowcb_prep(a, b, la, lb, carries=carries)
            dev = [jnp.asarray(x) for x in args]
            kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0,
                      interpret=False, k_steps=ks, **meta)
            fn = lambda: _pallas_rowcb(  # noqa: E731
                *dev, want_dirs=True, with_runs=True, **kw)
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out[1])
            ct = time.perf_counter() - t0
            if ref is None:
                ref = np.asarray(out[1])
                pin_fn = fn
                ok = True
            else:
                ok = bool(np.array_equal(np.asarray(out[1]), ref))
            dt = pipelined2(fn, lambda o: np.asarray(o[1][:1, :1]))
            dtp = pipelined2(pin_fn, lambda o: np.asarray(o[1][:1, :1]))
            emit(kind="rowcb_dirs", k_steps=ks,
                 block_b=meta["block_b"], compile_s=round(ct, 1),
                 gcups=round(cells / dt / 1e9, 2),
                 pin_k2_gcups=round(cells / dtp / 1e9, 2),
                 finals_equal=ok)
        except Exception as e:  # noqa: BLE001
            emit(kind="rowcb_dirs", k_steps=ks, error=str(e)[:250])

    # score variants for the ratio
    for ks in (2, 8):
        try:
            args, meta = rowcb_prep(a, b, la, lb, carries=11)
            dev = [jnp.asarray(x) for x in args]
            kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0,
                      interpret=False, k_steps=ks, **meta)
            fn = lambda: _pallas_rowcb(  # noqa: E731
                *dev, want_dirs=False, with_runs=False, **kw)
            jax.block_until_ready(fn()[1])
            dt = pipelined2(fn, lambda o: np.asarray(o[1][:1, :1]))
            emit(kind="rowcb_score", k_steps=ks,
                 block_b=meta["block_b"],
                 gcups=round(cells / dt / 1e9, 2))
        except Exception as e:  # noqa: BLE001
            emit(kind="rowcb_score", k_steps=ks, error=str(e)[:250])


if __name__ == "__main__":
    main()
