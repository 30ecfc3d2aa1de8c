"""Round-4: pallas walk kernel on hardware — equivalence + timing +
fused e2e. Run: python scripts/probes/pallas_walk_r4.py
"""

import functools
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
        _end_choice_vec,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.device_walk import (
        _walk_core_rle,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _pallas_rowcb,
        rowcb_prep,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_walk import (
        pallas_walk_rle,
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

    def timed_ms(fn, sync, iters=6):
        for _ in range(2):
            sync(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        for o in outs:
            sync(o)
        return (time.perf_counter() - t0) / iters * 1e3

    args, meta = rowcb_prep(a, b, la, lb, carries=11)
    dev = [jnp.asarray(x) for x in args]
    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False,
              k_steps=2, **meta)
    fill = lambda: _pallas_rowcb(  # noqa: E731
        *dev, want_dirs=True, with_runs=True, **kw)
    d16, fin = fill()
    jax.block_until_ready(fin)
    ms_ = timed_ms(fill, lambda o: np.asarray(o[1][:1, :1]))
    emit(kind="fill_dirs16", ms=round(ms_, 1),
         gcups=round(cells / ms_ / 1e6, 2))

    tables, _ = _end_choice_vec(np.asarray(fin)[:B, :3], -1, 2.0)
    la_d, lb_d = jnp.asarray(la), jnp.asarray(lb)
    tb_d = jnp.asarray(tables.astype(np.int32))
    ms = int(la.max() + lb.max()) + 1

    # equivalence on hardware
    try:
        ent_x, _ = jax.jit(functools.partial(
            _walk_core_rle, max_steps=ms, pair_axis=1))(
            d16, la_d, lb_d, tb_d)
        ent_p, used_p = pallas_walk_rle(d16, la_d, lb_d, tb_d,
                                        R_pad=ms)
        ex = np.asarray(ent_x).T
        ep = np.asarray(ent_p)
        up = np.asarray(used_p)
        bad = 0
        for r in range(B):
            xs = ex[r][ex[r] != 0]
            ps = ep[r][: int(up[r])]
            if not np.array_equal(xs, ps.astype(np.uint16)):
                bad += 1
        emit(kind="walk_equivalence", mismatched_pairs=bad,
             rounds_mean=float(np.mean(up)))
        wx = jax.jit(functools.partial(
            _walk_core_rle, max_steps=ms, pair_axis=1))
        msx = timed_ms(lambda: wx(d16, la_d, lb_d, tb_d),
                       lambda o: jax.block_until_ready(o[0]))
        msp = timed_ms(
            lambda: pallas_walk_rle(d16, la_d, lb_d, tb_d, R_pad=ms),
            lambda o: jax.block_until_ready(o[0]))
        emit(kind="walk_timing", xla_ms=round(msx, 1),
             pallas_ms=round(msp, 2))
    except Exception as e:  # noqa: BLE001
        emit(kind="walk", error=str(e)[:400])

    # fused dispatch + align_batch
    al = BatchAligner()
    try:
        fn = lambda: al._dispatch_fused(a, b, la, lb)  # noqa: E731
        h0 = fn()
        jax.block_until_ready(h0[1])
        dt = timed_ms(fn, lambda h: jax.block_until_ready(h[1]),
                      iters=4)
        emit(kind="fused_dispatch_device", ms=round(dt, 1),
             gcups=round(cells / dt / 1e6, 2))
        h1 = fn()
        jax.block_until_ready(h1[1])
        t0 = time.perf_counter()
        chains, arrays, tables2, scores = al._collect_fused(
            h1, la, lb, "parity", None, list(range(B)))
        emit(kind="collect_fused_host",
             ms=round((time.perf_counter() - t0) * 1e3, 1),
             chain0=len(chains[0]))
    except Exception as e:  # noqa: BLE001
        emit(kind="fused", error=str(e)[:400])

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


if __name__ == "__main__":
    main()
