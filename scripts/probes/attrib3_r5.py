"""Round-5 probe 3: permuted-lane rowscan — kill the unaligned sweeps.

attrib2_r5 measured that the 7 sub-128-lane shift-max sweeps of the
prefix-max cost ~45% of the whole rowscan row (pm_aligned = 0.52-0.60x
pin) while the >=128-stride (vreg-aligned) sweeps are nearly free, and
that pltpu.roll / int16 / liveness tweaks are dead ends.

Exploit: lay DP column j at flat lane position p with
    T(p) = p // 128 (tile), L(p) = p % 128 (lane),  j = L*Tn + T
so that
  * shift-by-1 in j  == concat(narrow 1-lane shift of the LAST tile,
    x[:, :-128])  — one 128-aligned wide copy + one 8-vreg narrow op,
    instead of an unaligned full-width lane shift;
  * prefix-max over j == aligned doubling over tiles (free) + a lane
    scan of ONE narrow (bb, 128) tile + tile-broadcast combine,
    instead of 7 unaligned full-width sweeps.
b_ext / lbmask are host-permuted; jj comes from iota math. Cell-exact
finals vs the production kernel are asserted.

Run: python scripts/probes/attrib3_r5.py [iters]
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
        _row0_t2,
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
    Tn = nl // 128
    # host permutation: flat position p holds column j = (p%128)*Tn+p//128
    pos_of_j = np.empty(nl, np.int64)
    p = np.arange(nl)
    j_of_p = (p % 128) * Tn + p // 128
    pos_of_j[j_of_p] = p
    a_pad, b_ext, lbmask, la_t = args
    b_perm = np.ascontiguousarray(b_ext[:, j_of_p])
    lb_perm = np.ascontiguousarray(lbmask[:, j_of_p])
    devp = [jnp.asarray(x) for x in (a_pad, b_perm, lb_perm, la_t)]

    g, h, match, mismatch, start_type = 1.0, 2.0, 1.0, 0.0, -1

    def neg(shape):
        return jnp.full(shape, jnp.float32(NEG_INF))

    def shift_j(x):
        """value of column j-1 at position of column j (fill -inf)."""
        last = x[..., (Tn - 1) * 128:]
        fix0 = jnp.concatenate(
            [neg(last.shape[:-1] + (1,)), last[..., :-1]], axis=-1)
        return jnp.concatenate([fix0, x[..., : (Tn - 1) * 128]],
                               axis=-1)

    def pm_perm(x):
        """inclusive prefix max over j in the permuted layout."""
        s = 128
        while s < nl:  # aligned doubling over tiles (within-lane)
            x = jnp.maximum(
                x, jnp.concatenate(
                    [neg(x.shape[:-1] + (s,)), x[..., :-s]], axis=-1))
            s *= 2
        tot = x[..., (Tn - 1) * 128:]     # per-lane totals (all tiles)
        e = jnp.concatenate(              # exclusive lane prefix
            [neg(tot.shape[:-1] + (1,)), tot[..., :-1]], axis=-1)
        s = 1
        while s < 128:
            e = jnp.maximum(
                e, jnp.concatenate(
                    [neg(e.shape[:-1] + (s,)), e[..., :-s]], axis=-1))
            s *= 2
        ew = jnp.concatenate([e] * Tn, axis=-1)
        return jnp.maximum(x, ew)

    def perm_kernel(a_ref, bext_ref, lbmask_ref, la_ref, out_ref,
                    *, unroll=4):
        bb = bext_ref.shape[0]
        pidx = jax.lax.broadcasted_iota(jnp.int32, (bb, nl), 1)
        jj = (pidx % 128) * Tn + pidx // 128
        b_ext = bext_ref[...]
        lbmask = lbmask_ref[...] != 0
        gf, hf = jnp.float32(g), jnp.float32(h)
        neg_inf = jnp.float32(NEG_INF)
        lane0 = jj == 0
        jg = gf * jj.astype(jnp.float32)
        r1 = jnp.where(lane0, jnp.float32(0.0), neg_inf)
        r2 = jnp.where(lane0, neg_inf, _row0_t2(jj, gf, hf, start_type))
        r3 = jnp.full((bb, nl), neg_inf)

        def row_step(i, t123):
            p1, p2, p3 = t123
            a_col = _char_col(a_ref, i - 1)
            fb = jnp.where(b_ext == a_col, jnp.float32(match),
                           jnp.float32(mismatch))
            mp12 = jnp.maximum(p1, p2)
            t1 = fb + shift_j(jnp.maximum(mp12, p3))
            t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
            t1 = jnp.where(lane0, neg_inf, t1)
            t3 = jnp.where(lane0, _col0_t3(i, gf, hf, start_type), t3)
            m13 = shift_j(jnp.maximum(t1, t3))
            omega = jg + m13 - gf - hf
            pm = pm_perm(omega)
            t2 = jnp.where(lane0, neg_inf, pm - jg)
            return (t1, t2, t3)

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

    @functools.partial(jax.jit, static_argnames=("unroll",))
    def run_perm(a_pad, b_ext, lbmask, la_t, *, unroll=4):
        kern = functools.partial(perm_kernel, unroll=unroll)
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
        return (time.perf_counter() - t0) / iters

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    fns = {}
    for unroll in (4, 8):
        t0 = time.perf_counter()
        try:
            np.asarray(run_perm(*devp, unroll=unroll))
            emit(kind="compile", name=f"perm_u{unroll}",
                 s=round(time.perf_counter() - t0, 1))
            fns[f"perm_u{unroll}"] = (
                lambda unroll=unroll: run_perm(*devp, unroll=unroll))
        except Exception as e:  # noqa: BLE001
            emit(kind="compile_error", name=f"perm_u{unroll}",
                 err=str(e)[:300])
    t0 = time.perf_counter()
    np.asarray(pin())
    emit(kind="compile", name="pin", s=round(time.perf_counter() - t0, 1))

    want = np.asarray(pin())[:batch, :3]
    got = np.asarray(run_perm(*devp, unroll=4))[:batch, :3]
    emit(kind="sanity", perm_equals_pin=bool(np.array_equal(want, got)))

    for rnd in range(3):
        dt_pin = timed(pin)
        emit(kind="timing", round=rnd, name="pin",
             us_per_row=round(dt_pin / m * 1e6, 3),
             gcups=round(cells / dt_pin / 1e9, 2))
        for name, f in fns.items():
            dt = timed(f)
            emit(kind="timing", round=rnd, name=name,
                 us_per_row=round(dt / m * 1e6, 3),
                 gcups=round(cells / dt / 1e9, 2),
                 vs_pin=round(dt / dt_pin, 3))


if __name__ == "__main__":
    main()
