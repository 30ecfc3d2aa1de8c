"""Round-4: isolate the on-device RLE walk cost.

Produces dirs16 ONCE (device-resident), then times _walk_core_rle as
its own jit at several unrolls, plus a flat-1D-gather variant, the
fill alone, and the fused program — all same-process with a pinned
fill interleaved. Run: python scripts/probes/walk_isolate_r4.py
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

    import cse305_parallel_sequence_alignment_tpu.ops.device_walk as dw
    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        _end_choice_vec,
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
    t0 = time.perf_counter()
    d16, fin = fill()
    jax.block_until_ready(fin)
    emit(kind="fill_compile_s", s=round(time.perf_counter() - t0, 1))
    ms = timed_ms(fill, lambda o: np.asarray(o[1][:1, :1]))
    emit(kind="fill_dirs16", ms=round(ms, 1),
         gcups=round(cells / ms / 1e6, 2))

    tables, _ = _end_choice_vec(np.asarray(fin)[:B, :3], -1, 2.0)
    la_d = jnp.asarray(la)
    lb_d = jnp.asarray(lb)
    tb_d = jnp.asarray(tables.astype(np.int32))
    max_steps = int(la.max() + lb.max()) + 1

    walk = jax.jit(functools.partial(
        dw._walk_core_rle, max_steps=max_steps, pair_axis=1))
    t0 = time.perf_counter()
    jax.block_until_ready(walk(d16, la_d, lb_d, tb_d)[0])
    emit(kind="walk_compile_s", s=round(time.perf_counter() - t0, 1))
    ms = timed_ms(lambda: walk(d16, la_d, lb_d, tb_d),
                  lambda o: jax.block_until_ready(o[0]))
    emit(kind="walk_rle_alone", ms=round(ms, 1))

    # unroll sweep on the walk
    for U in (1, 4, 16, 32):
        dw._WALK_UNROLL = U
        walkU = jax.jit(functools.partial(
            dw._walk_core_rle, max_steps=max_steps + U,  # cache-bust
            pair_axis=1))
        try:
            ms = timed_ms(lambda: walkU(d16, la_d, lb_d, tb_d),
                          lambda o: jax.block_until_ready(o[0]))
            emit(kind="walk_unroll", U=U, ms=round(ms, 1))
        except Exception as e:  # noqa: BLE001
            emit(kind="walk_unroll", U=U, error=str(e)[:200])
    dw._WALK_UNROLL = 8

    # flat-gather variant: linear indices into a reshaped 1D array
    def walk_flat(d, i0, j0, t0_, *, max_steps):
        nrows, Bp, nl = d.shape
        dflat = d.reshape(-1)
        bidx = jnp.arange(B, dtype=jnp.int32)
        shifts = jnp.array([0, 0, 2, 4], jnp.int32)

        def one(i, j, t, done):
            r = jnp.clip(i, 0, nrows - 1)
            c = jnp.clip(j, 0, nl - 1)
            word = jnp.take(
                dflat, (r * Bp + bidx) * nl + c).astype(jnp.int32)
            c_now = ((word & 0xFF) >> shifts[t]) & 3
            is_run = t == 1
            k = jnp.where(is_run, (word >> 8) & 255, 0)
            op = jnp.where(is_run, (word >> 6) & 3, c_now)
            di = jnp.where(is_run, k + 1, jnp.where(t == 3, 1, 0))
            dj = jnp.where(is_run, k + 1, jnp.where(t == 2, 1, 0))
            act = ~done
            i2 = jnp.where(act, i - di, i)
            j2 = jnp.where(act, j - dj, j)
            t2 = jnp.where(act, op + 1, t)
            done2 = done | (i2 <= 0) | (j2 <= 0)
            return i2, j2, t2, done2

        U = 8
        nblk = -(-max_steps // U)

        def cond(s):
            return (s[4] < nblk) & ~jnp.all(s[3])

        def body(s):
            i, j, t, done, k2 = s
            for _ in range(U):
                i, j, t, done = one(i, j, t, done)
            return (i, j, t, done, k2 + 1)

        i0 = i0.astype(jnp.int32)
        j0 = j0.astype(jnp.int32)
        done0 = (i0 == 0) | (j0 == 0)
        out = jax.lax.while_loop(
            cond, body, (i0, j0, t0_.astype(jnp.int32), done0,
                         jnp.int32(0)))
        return out[0], out[4]

    wf = jax.jit(functools.partial(walk_flat, max_steps=max_steps))
    try:
        jax.block_until_ready(wf(d16, la_d, lb_d, tb_d)[0])
        ms = timed_ms(lambda: wf(d16, la_d, lb_d, tb_d),
                      lambda o: jax.block_until_ready(o[0]))
        emit(kind="walk_flat_take", ms=round(ms, 1))
    except Exception as e:  # noqa: BLE001
        emit(kind="walk_flat_take", error=str(e)[:200])

    # re-pin the fill to normalize chip state
    ms = timed_ms(fill, lambda o: np.asarray(o[1][:1, :1]))
    emit(kind="fill_dirs16_repin", ms=round(ms, 1),
         gcups=round(cells / ms / 1e6, 2))


if __name__ == "__main__":
    main()
