"""Round-4 probe: halo-staircase D=1 rate + rowscan prefix ablation.

One process, one chip claim. Pinned rowscan interleaves every segment
so the chip lottery is visible. Run:
    python scripts/probes/halostair_r4.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import cse305_parallel_sequence_alignment_tpu.ops.pallas_fill as pf
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _pallas_rowscan,
        _pallas_rowscan2,
        rowscan_prep,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_halostair \
        import pick_geometry
    from cse305_parallel_sequence_alignment_tpu.parallel.longseq import (
        _halostair_jit,
        _longseq_jit,
        _MeshHolder,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.wavefront import (
        PAD_A,
        PAD_B,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)

    # --- pinned batched rowscan ---
    batch, m2, n2 = 256, 2048, 2048
    a = rng.integers(65, 69, size=(batch, m2)).astype(np.uint8)
    b = rng.integers(65, 69, size=(batch, n2)).astype(np.uint8)
    la = np.full((batch,), m2, np.int32)
    lb = np.full((batch,), n2, np.int32)
    cells2 = batch * m2 * n2
    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1,
              interpret=False)
    args64, meta64 = rowscan_prep(a, b, la, lb, block_b=64, carries=7)
    dev64 = [jnp.asarray(x) for x in args64]
    pin = lambda: _pallas_rowscan(*dev64, **kw, **meta64)  # noqa: E731

    def timed(fn, cells, iters=6):
        for _ in range(2):
            np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        for o in outs:
            jax.block_until_ready(o)
        return cells / ((time.perf_counter() - t0) / iters) / 1e9

    t0 = time.perf_counter()
    np.asarray(pin())
    print(f"pin compiled {time.perf_counter()-t0:.1f}s", flush=True)

    def emit(**row):
        print(json.dumps(row), flush=True)

    # --- halostair D=1 ---
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("seq",))
    hold = _MeshHolder(mesh1)

    def halostair_setup(L, R):
        aa = rng.integers(65, 69, size=(L,)).astype(np.uint8)
        bb = rng.integers(65, 69, size=(L,)).astype(np.uint8)
        D = 1
        nc = L + 1
        S, nl_c = pick_geometry(nc)
        C = -(-L // R)
        W = 128 + C * R + 256
        a_pad = np.full((1, W), int(PAD_A), np.int32)
        a_pad[0, 128: 128 + L] = aa
        b_sub = np.full((D * S * nl_c,), int(PAD_B), np.int32)
        b_sub[1: L + 1] = bb
        b_sub = b_sub.reshape(D * S, nl_c)
        a_dev = jax.device_put(jnp.asarray(a_pad),
                               NamedSharding(mesh1, P()))
        b_dev = jax.device_put(jnp.asarray(b_sub),
                               NamedSharding(mesh1, P("seq")))
        fn = lambda: _halostair_jit(  # noqa: E731
            a_dev, b_dev, jnp.int32(L), jnp.int32(L), S, nl_c, R, C, D,
            1.0, 2.0, 1.0, 0.0, -1, False, hold)[0]
        return fn, L * L, (S, nl_c, C)

    for (L, R) in ((8192, 512), (8192, 256), (16384, 512),
                   (32768, 1024)):
        try:
            fn, cells, geo = halostair_setup(L, R)
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ct = time.perf_counter() - t0
            g = timed(fn, cells, iters=4)
            gp = timed(pin, cells2, iters=4)
            emit(kind="halostair_d1", L=L, R=R, S=geo[0], nl_c=geo[1],
                 C=geo[2], compile_s=round(ct, 1), gcups=round(g, 2),
                 pin_gcups=round(gp, 2))
        except Exception as e:  # noqa: BLE001
            emit(kind="halostair_d1", L=L, R=R, error=str(e)[:300])

    # --- XLA body reference at 8 kb (round-3 recorded 0.242) ---
    try:
        L = 8192
        aa = rng.integers(65, 69, size=(L,)).astype(np.uint8)
        bb = rng.integers(65, 69, size=(L,)).astype(np.uint8)
        D, R = 1, 256
        nc = -(-(L + 1) // D)
        C = -(-L // R)
        a_pad = np.full((C * R,), PAD_A, np.uint8)
        a_pad[:L] = aa
        b_pad = np.full((nc * D,), PAD_B, np.uint8)
        b_pad[:L] = bb
        a_dev = jax.device_put(jnp.asarray(a_pad),
                               NamedSharding(mesh1, P()))
        b_dev = jax.device_put(jnp.asarray(b_pad),
                               NamedSharding(mesh1, P("seq")))
        fn = lambda: _longseq_jit(  # noqa: E731
            a_dev, b_dev, jnp.int32(L), jnp.int32(L), L, L, nc, R, D,
            1.0, 2.0, 1.0, 0.0, -1, hold)[0]
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ct = time.perf_counter() - t0
        g = timed(fn, L * L, iters=2)
        emit(kind="longseq_xla_d1", L=L, compile_s=round(ct, 1),
             gcups=round(g, 3))
    except Exception as e:  # noqa: BLE001
        emit(kind="longseq_xla_d1", error=str(e)[:300])

    # --- prefix-max ablation on rowscan2 (PERF ONLY, wrong results) ---
    args5, meta5 = rowscan_prep(a, b, la, lb, block_b=64, carries=5)
    dev5 = [jnp.asarray(x) for x in args5]
    orig_pm = pf._lane_prefix_max

    def make_pm(max_sweeps):
        def pm(x, nl):
            s, cnt = 1, 0
            while s < nl and cnt < max_sweeps:
                shifted = jnp.concatenate(
                    [pf._neg(x.shape[:-1] + (s,)), x[..., :-s]],
                    axis=-1)
                x = jnp.maximum(x, shifted)
                s *= 2
                cnt += 1
            return x
        return pm

    # distinct unroll values force distinct jit cache entries so the
    # patched prefix is actually traced per variant
    for sweeps, unr in ((99, 4), (6, 5), (0, 6), (3, 7)):
        pf._lane_prefix_max = orig_pm if sweeps == 99 else make_pm(sweeps)
        try:
            fn = lambda: _pallas_rowscan2(  # noqa: E731
                *dev5, **kw, **meta5, unroll=unr)
            t0 = time.perf_counter()
            np.asarray(fn())
            ct = time.perf_counter() - t0
            g = timed(fn, cells2, iters=4)
            gp = timed(pin, cells2, iters=4)
            emit(kind="pm_ablate", sweeps=sweeps, unroll=unr,
                 compile_s=round(ct, 1), gcups=round(g, 2),
                 pin_gcups=round(gp, 2))
        except Exception as e:  # noqa: BLE001
            emit(kind="pm_ablate", sweeps=sweeps, error=str(e)[:300])
    pf._lane_prefix_max = orig_pm


if __name__ == "__main__":
    main()
