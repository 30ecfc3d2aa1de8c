"""Round-5 attribution probe 2: price the prefix-max parts, cheaper
shifts, dtype width, and the liveness cliff.

Follow-up to attrib_r5.py which found: prefix-max = 30-46% of the
rowscan row time, unaligned shifts ~10%, char ~5%, and a 4x per-op
cost cliff between 16 and 34 chained wide ops. This probe asks:

  * is the pm cost in the 7 unaligned sweeps or the 5 aligned ones?
  * does pltpu.roll lower lane shifts cheaper than concatenate?
  * does int16 vector arithmetic lower at all (half VMEM traffic)?
  * where exactly is the liveness cliff (2/4/6/8 live wide arrays)?
  * what does the old diagonal kernel do device-resident today?
  * block_b 32 vs 64 per-row time (traffic model: time ~ block_b)

Run: python scripts/probes/attrib2_r5.py [iters]
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
        _pack3,
        _pallas_rowscan,
        _pallas_score,
        _prep_inputs,
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
    nl = meta["nl"]
    args32, meta32 = rowscan_prep(a, b, la, lb, block_b=32, carries=7)
    dev32 = [jnp.asarray(x) for x in args32]

    g, h, match, mismatch, start_type = 1.0, 2.0, 1.0, 0.0, -1

    def lane_pm(x, mode, jj):
        neg = jnp.float32(NEG_INF)
        if mode == "pm_roll":
            s = 1
            while s < nl:
                rolled = pltpu.roll(x, s, 1)
                x = jnp.maximum(x, jnp.where(jj < s, neg, rolled))
                s *= 2
            return x
        strides = []
        s = 1
        while s < nl:
            strides.append(s)
            s *= 2
        if mode == "pm_unaligned":
            strides = [s for s in strides if s < 128]
        elif mode == "pm_aligned":
            strides = [s for s in strides if s >= 128]
        for s in strides:
            shifted = jnp.concatenate(
                [jnp.full(x.shape[:-1] + (s,), neg), x[..., :-s]],
                axis=-1)
            x = jnp.maximum(x, shifted)
        return x

    def make_shift(mode, jj):
        neg = jnp.float32(NEG_INF)
        if mode == "shift_roll":
            def sh(x):
                return jnp.where(jj < 1, neg, pltpu.roll(x, 1, 1))
            return sh
        return _shift_right_neg

    def variant_kernel(a_ref, bext_ref, lbmask_ref, la_ref, out_ref,
                       *, mode, K, L, unroll=4):
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
        shift = make_shift(mode, jj)

        def row_step(i, t123):
            p1, p2, p3 = t123
            a_col = _char_col(a_ref, i - 1)
            fb = jnp.where(b_ext == a_col, jnp.float32(match),
                           jnp.float32(mismatch))
            mp12 = jnp.maximum(p1, p2)
            t1 = fb + shift(jnp.maximum(mp12, p3))
            t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
            t1 = jnp.where(lane0, neg_inf, t1)
            t3 = jnp.where(lane0, _col0_t3(i, gf, hf, start_type), t3)
            m13 = shift(jnp.maximum(t1, t3))
            omega = jg + m13 - gf - hf
            pm = lane_pm(omega, mode, jj)
            t2 = jnp.where(lane0, neg_inf, pm - jg)
            return (t1, t2, t3)

        if mode == "live":
            # K dependent ops rotating over L live wide arrays
            def body(s, pq):
                p1, p2, p3 = _unpack3(pq, nl)
                arrs = [p1, p2, p3][:max(L, 1)]
                while len(arrs) < L:
                    arrs.append(arrs[len(arrs) % 3] +
                                jnp.float32(0.125 * len(arrs)))
                x = arrs[0]
                for k in range(K):
                    x = jnp.maximum(x + jnp.float32(0.5),
                                    arrs[(k + 1) % L])
                return _pack3((x, p2, p3))

            pq = jax.lax.fori_loop(0, m, body, _pack3((r1, r2, r3)))
            t123 = _unpack3(pq, nl)
        elif mode == "chain_i16":
            def body(s, pq):
                p1, p2, p3 = _unpack3(pq, nl)
                x = p1.astype(jnp.int16)
                y = p2.astype(jnp.int16)
                for k in range(K):
                    x = jnp.maximum(
                        x + jnp.int16(1), y)
                return _pack3((x.astype(jnp.float32), p2, p3))

            pq = jax.lax.fori_loop(0, m, body, _pack3((r1, r2, r3)))
            t123 = _unpack3(pq, nl)
        elif mode == "chain_i32":
            def body(s, pq):
                p1, p2, p3 = _unpack3(pq, nl)
                x = p1.astype(jnp.int32)
                y = p2.astype(jnp.int32)
                for k in range(K):
                    x = jnp.maximum(x + jnp.int32(1), y)
                return _pack3((x.astype(jnp.float32), p2, p3))

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

    @functools.partial(jax.jit,
                       static_argnames=("mode", "K", "L", "block_b"))
    def run_variant(a_pad, b_ext, lbmask, la_t, *, mode, K=0, L=3,
                    block_b=64):
        kern = functools.partial(variant_kernel, mode=mode, K=K, L=L)
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

    # the old diagonal kernel, device-resident
    a_fwd, b_ext2, lbm2, dsum2, _B, dm, dn, dnl, dblock = _prep_inputs(
        a, b, la, lb, 64)
    ddev = [jnp.asarray(x) for x in (a_fwd, b_ext2, lbm2, dsum2)]
    dmeta = dict(m=dm, n=dn, nl=dnl, block_b=dblock)
    diag = lambda: _pallas_score(*ddev, **kw, **dmeta)  # noqa: E731

    def timed(fn):
        for _ in range(2):
            np.asarray(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out)
        return (time.perf_counter() - t0) / iters

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    variants = [
        ("full", dict()),
        ("pm_roll", dict()),
        ("shift_roll", dict()),
        ("pm_unaligned", dict()),
        ("pm_aligned", dict()),
        ("full_b32", dict(block_b=32)),
        ("live", dict(mode="live", K=16, L=2)),
        ("live", dict(mode="live", K=16, L=4)),
        ("live", dict(mode="live", K=16, L=6)),
        ("live", dict(mode="live", K=16, L=8)),
        ("chain_i32", dict(mode="chain_i32", K=16)),
        ("chain_i16", dict(mode="chain_i16", K=16)),
    ]
    fns = {}
    for name, ov in variants:
        mode = ov.pop("mode", name)
        bb = ov.pop("block_b", 64)
        dv = dev32 if bb == 32 else dev
        key = (name, tuple(sorted(ov.items())))
        f = (lambda mode=mode, ov=dict(ov), dv=dv, bb=bb:
             run_variant(*dv, mode=mode, block_b=bb, **ov))
        t0 = time.perf_counter()
        try:
            np.asarray(f())
            emit(kind="compile", name=name, **ov,
                 s=round(time.perf_counter() - t0, 1))
            fns[key] = (f, ov)
        except Exception as e:  # noqa: BLE001
            emit(kind="compile_error", name=name, **ov,
                 err=str(e)[:300])
    for nm, f in (("pin", pin), ("diag", diag)):
        t0 = time.perf_counter()
        np.asarray(f())
        emit(kind="compile", name=nm,
             s=round(time.perf_counter() - t0, 1))

    want = np.asarray(pin())[:batch, :3]
    got = np.asarray(run_variant(*dev, mode="full"))[:batch, :3]
    gotd = np.asarray(diag())[:batch, :3]
    gotr = None
    if ("pm_roll", ()) in fns:
        gotr = np.asarray(run_variant(*dev, mode="pm_roll"))[:batch, :3]
    gots = None
    if ("shift_roll", ()) in fns:
        gots = np.asarray(
            run_variant(*dev, mode="shift_roll"))[:batch, :3]
    emit(kind="sanity", full=bool(np.array_equal(want, got)),
         diag=bool(np.array_equal(want, gotd)),
         pm_roll=None if gotr is None else bool(
             np.array_equal(want, gotr)),
         shift_roll=None if gots is None else bool(
             np.array_equal(want, gots)))

    for rnd in range(3):
        dt_pin = timed(pin)
        emit(kind="timing", round=rnd, name="pin",
             us_per_row=round(dt_pin / m * 1e6, 3),
             gcups=round(cells / dt_pin / 1e9, 2))
        dt = timed(diag)
        emit(kind="timing", round=rnd, name="diag",
             us_per_row=round(dt / m * 1e6, 3),
             gcups=round(cells / dt / 1e9, 2),
             vs_pin=round(dt / dt_pin, 3))
        for (name, ovt), (f, ov) in fns.items():
            dt = timed(f)
            emit(kind="timing", round=rnd, name=name, **ov,
                 us_per_row=round(dt / m * 1e6, 3),
                 gcups=round(cells / dt / 1e9, 2),
                 vs_pin=round(dt / dt_pin, 3))


if __name__ == "__main__":
    main()
