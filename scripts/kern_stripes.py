"""Test: interleave S independent batch stripes per row step to hide
the per-op dependency latency (kern_sweep showed a fixed ~12.4us/row
floor regardless of width -> latency-bound serial chain).

Carries: Mosaic SIGABRTs at >=3 large f32 loop carries, so stripes are
packed two-per-carry and sliced on sublanes inside the body.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from cse305_parallel_sequence_alignment_tpu.core import NEG_INF  # noqa: E402
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (  # noqa: E402
    _lane_prefix_max,
    _neg,
    _pack3,
    _shift_right_neg,
    _unpack3,
)

M = 2048
NL = 2176


def _kernel(bext_ref, out_ref, *, total_b, stripes, unroll):
    sb = total_b // stripes
    jj = jax.lax.broadcasted_iota(jnp.int32, (sb, NL), 1)
    gf, hf = jnp.float32(1.0), jnp.float32(2.0)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)
    jgc = jg - gf - hf

    r1 = jnp.where(lane0, jnp.float32(0.0), neg_inf)
    r2 = jnp.where(lane0, neg_inf, -hf - jg)
    r3 = _neg((sb, NL))

    def row_step(i, t123, b_ext):
        p1, p2, p3 = t123
        fb = jnp.where(b_ext == 65, jnp.float32(1.0), jnp.float32(0.0))
        mp12 = jnp.maximum(p1, p2)
        mx = jnp.maximum(mp12, p3)
        t1 = fb + _shift_right_neg(mx)  # lane0 -inf via shift fill
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        t3 = jnp.where(lane0, -hf - gf * i, t3)
        m13 = _shift_right_neg(jnp.maximum(t1, t3))
        omega = jgc + m13
        pm = _lane_prefix_max(omega, NL)
        t2 = pm - jg  # lane0 -inf flows from shift fill
        return (t1, t2, t3)

    def body(s, carries):
        outs = []
        for ci, c in enumerate(carries):
            per = c.shape[0] // sb
            news = []
            for k in range(per):
                t123 = _unpack3(c[k * sb: (k + 1) * sb], NL)
                b_ext = bext_ref[pl.ds((ci * per + k) * sb, sb), :]
                for u in range(unroll):
                    t123 = row_step(s * unroll + u + 1, t123, b_ext)
                news.append(_pack3(t123))
            outs.append(jnp.concatenate(news, axis=0) if per > 1
                        else news[0])
        return tuple(outs)

    n_carries = min(stripes, 2)
    per_carry = stripes // n_carries
    init = tuple(
        jnp.concatenate([_pack3((r1, r2, r3))] * per_carry, axis=0)
        if per_carry > 1 else _pack3((r1, r2, r3))
        for _ in range(n_carries))
    fin = jax.lax.fori_loop(0, M // unroll, body, init)
    t1, t2, t3 = _unpack3(fin[0][:sb], NL)
    out_ref[...] = (jnp.maximum(jnp.maximum(t1, t2), t3))[:8, :128]


def run_case(total_b, stripes, unroll=4):
    kern = functools.partial(_kernel, total_b=total_b, stripes=stripes,
                             unroll=unroll)

    @jax.jit
    def go(b):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(b)

    rng = np.random.default_rng(7)
    b_ext = jnp.asarray(
        rng.integers(60, 70, size=(total_b, NL)).astype(np.int32))
    try:
        np.asarray(go(b_ext))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(go(b_ext))
        dt = (time.perf_counter() - t0) / reps
        gcups = total_b * M * (NL - 128) / dt / 1e9
        print(f"B={total_b:3d} stripes={stripes} unroll={unroll:2d} "
              f"{dt*1e3:9.2f} ms {dt/M*1e9:8.0f} ns/row "
              f"{gcups:7.2f} GCUPS", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"B={total_b} stripes={stripes}: FAILED "
              f"{type(e).__name__}: {str(e)[:90]}", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    run_case(256, 1)
    run_case(256, 2)
    run_case(256, 4)
    run_case(256, 8)
    run_case(128, 2)
    run_case(128, 4)
    run_case(256, 4, unroll=2)
    run_case(256, 4, unroll=8)


if __name__ == "__main__":
    main()
