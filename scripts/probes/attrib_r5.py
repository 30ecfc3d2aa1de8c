"""Round-5 attribution probe: WHAT binds the rowscan row time?

Round-4 refuted the op-count model (60% op removal flat) AND left the
latency-chain model contradicted (dual-stream ratio 1.00). This probe
isolates the per-row components never ablated in round 4 — the two
unaligned shift-by-1 ops, the per-row char extraction, the fb
compare/select, the lane-0 boundary selects — and measures raw
dependent/independent max-chain floors at the same (block_b, nl)
geometry, so each component gets a cycles/row price and the row model
can be rebuilt from measured parts.

Same-process interleaved A/Bs against the production rowscan pin
(CLAUDE.md ground rule: the chip lottery voids everything else).

Run: python scripts/probes/attrib_r5.py [iters]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():  # noqa: PLR0915
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        NEG_INF,
        _char_col,
        _col0_t3,
        _emit_row,
        _lane_prefix_max,
        _pack3,
        _pallas_rowscan,
        _row0_t2,
        _shift_right_neg,
        _unpack3,
        rowscan_prep,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(11)
    batch, m, n = 256, 2048, 2048
    a = rng.integers(65, 69, size=(batch, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(batch, n)).astype(np.uint8)
    la = np.full((batch,), m, np.int32)
    lb = np.full((batch,), n, np.int32)
    cells = batch * m * n

    args, meta = rowscan_prep(a, b, la, lb, block_b=64, carries=7)
    dev = [jnp.asarray(x) for x in args]
    nl, block_b = meta["nl"], meta["block_b"]
    assert meta["uniform_la"]

    g, h, match, mismatch, start_type = 1.0, 2.0, 1.0, 0.0, -1

    def variant_kernel(a_ref, bext_ref, lbmask_ref, la_ref, out_ref,
                       *, mode, K, unroll=4):
        """uniform_la rowscan replica with ablation switches."""
        bb = bext_ref.shape[0]
        jj = jax.lax.broadcasted_iota(jnp.int32, (bb, nl), 1)
        b_ext = bext_ref[...]
        lbmask = lbmask_ref[...] != 0
        gf, hf = jnp.float32(g), jnp.float32(h)
        neg_inf = jnp.float32(NEG_INF)
        lane0 = jj == 0
        jg = gf * jj.astype(jnp.float32)
        r1 = jnp.where(lane0, jnp.float32(0.0), neg_inf)
        r2 = jnp.where(lane0, neg_inf, _row0_t2(jj, gf, hf, start_type))
        r3 = jnp.full((bb, nl), neg_inf)

        shift = (lambda x: x) if mode in ("noshift", "nochar_noshift") \
            else _shift_right_neg

        def row_step(i, t123):
            p1, p2, p3 = t123
            if mode in ("nochar", "nochar_noshift"):
                # keep a cheap i-dependence so nothing hoists
                a_col = jnp.full((bb, 1), 1, jnp.int32) * (i & 3) + 65
            else:
                a_col = _char_col(a_ref, i - 1)
            if mode == "nofb":
                fb = jnp.float32(1.0) + jnp.float32(0.0) * \
                    p1[:, 0:1]  # keep a dep, kill the compare/select
            else:
                fb = jnp.where(b_ext == a_col, jnp.float32(match),
                               jnp.float32(mismatch))
            mp12 = jnp.maximum(p1, p2)
            t1 = fb + shift(jnp.maximum(mp12, p3))
            if mode == "not3":
                t3 = p3 - gf
            else:
                t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
            if mode != "noboundary":
                t1 = jnp.where(lane0, neg_inf, t1)
                t3 = jnp.where(lane0, _col0_t3(i, gf, hf, start_type),
                               t3)
            m13 = shift(jnp.maximum(t1, t3))
            omega = jg + m13 - gf - hf
            if mode == "nopm":
                pm = omega
            else:
                pm = _lane_prefix_max(omega, nl)
            if mode == "noboundary":
                t2 = pm - jg
            else:
                t2 = jnp.where(lane0, neg_inf, pm - jg)
            return (t1, t2, t3)

        if mode in ("chain", "indep"):
            # raw floors: K wide ops per "row", nothing else
            def body(s, pq):
                t123 = _unpack3(pq, nl)
                p1, p2, p3 = t123
                if mode == "chain":
                    x = p1
                    for k in range(K):
                        x = jnp.maximum(x + jnp.float32(0.5), p2)
                    p1 = x
                else:
                    ys = [p1, p2, p3, p1 + jnp.float32(0.25)]
                    for k in range(K // 4):
                        ys = [y + jnp.float32(0.5) for y in ys]
                    p1 = jnp.maximum(jnp.maximum(ys[0], ys[1]),
                                     jnp.maximum(ys[2], ys[3]))
                return _pack3((p1, p2, p3))

            pq = jax.lax.fori_loop(0, m, body, _pack3((r1, r2, r3)))
            t123 = _unpack3(pq, nl)
        else:
            def body(s, pq):
                t123 = _unpack3(pq, nl)
                for u in range(unroll):
                    t123 = row_step(s * unroll + u + 1, t123)
                return _pack3(t123)

            pq = jax.lax.fori_loop(0, m // unroll, body,
                                   _pack3((r1, r2, r3)))
            t123 = _unpack3(pq, nl)
        finals = [jnp.max(jnp.where(lbmask, t, neg_inf), axis=-1,
                          keepdims=True) for t in t123]
        out_ref[...] = _emit_row(finals)

    @functools.partial(jax.jit, static_argnames=("mode", "K"))
    def run_variant(a_pad, b_ext, lbmask, la_t, *, mode, K=0):
        kern = functools.partial(variant_kernel, mode=mode, K=K)
        grid = (a_pad.shape[0] // block_b,)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, a_pad.shape[1]),
                             lambda bb: (bb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, nl), lambda bb: (bb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, nl), lambda bb: (bb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, 128), lambda bb: (bb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, 128), lambda bb: (bb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((a_pad.shape[0], 128),
                                           jnp.float32),
            interpret=False,
        )(a_pad, b_ext, lbmask, la_t)

    kw = dict(g=g, h=h, match=match, mismatch=mismatch,
              start_type=start_type, interpret=False)
    pin = lambda: _pallas_rowscan(*dev, **kw, **meta)  # noqa: E731

    def timed(fn):
        for _ in range(2):
            np.asarray(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        return dt

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    variants = [("full", 0), ("nochar", 0), ("noshift", 0),
                ("nochar_noshift", 0), ("nofb", 0), ("nopm", 0),
                ("not3", 0), ("noboundary", 0),
                ("chain", 4), ("chain", 8), ("chain", 16), ("chain", 34),
                ("indep", 8), ("indep", 16), ("indep", 32)]

    # compile everything first (serial through the compile service)
    fns = {}
    for mode, K in variants:
        t0 = time.perf_counter()
        f = lambda mode=mode, K=K: run_variant(*dev, mode=mode, K=K)
        try:
            np.asarray(f())
            emit(kind="compile", mode=mode, K=K,
                 s=round(time.perf_counter() - t0, 1))
            fns[(mode, K)] = f
        except Exception as e:  # noqa: BLE001
            emit(kind="compile_error", mode=mode, K=K, err=str(e)[:300])
    t0 = time.perf_counter()
    np.asarray(pin())
    emit(kind="compile", mode="pin", s=round(time.perf_counter() - t0, 1))

    # sanity: full replica must equal pin's cells
    want = np.asarray(pin())[:batch, :3]
    got = np.asarray(run_variant(*dev, mode="full", K=0))[:batch, :3]
    emit(kind="sanity", full_equals_pin=bool(np.array_equal(want, got)))

    for rnd in range(3):
        dt_pin = timed(pin)
        emit(kind="timing", round=rnd, mode="pin",
             us_per_row=round(dt_pin / m * 1e6, 3),
             gcups=round(cells / dt_pin / 1e9, 2))
        for (mode, K), f in fns.items():
            dt = timed(f)
            emit(kind="timing", round=rnd, mode=mode, K=K,
                 us_per_row=round(dt / m * 1e6, 3),
                 gcups=round(cells / dt / 1e9, 2),
                 vs_pin=round(dt / dt_pin, 3))


if __name__ == "__main__":
    main()
