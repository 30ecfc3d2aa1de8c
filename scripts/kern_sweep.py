"""Sweep block_b and lane width for the rowscan row-step floor.

Hypothesis from kern_attrib: the ~12us/row floor is working-set
residency — 3 tables x 136 vregs + temporaries overflow the vector
register file and every op streams VMEM. If true, ns/row should drop
superlinearly as the per-table vreg count shrinks. Run on chip.
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


def _kernel(bext_ref, out_ref, *, nl, block_b, unroll):
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    gf, hf = jnp.float32(1.0), jnp.float32(2.0)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)

    r1 = jnp.where(lane0, jnp.float32(0.0), neg_inf)
    r2 = jnp.where(lane0, neg_inf, -hf - jg)
    r3 = _neg((block_b, nl))

    def row_step(i, t123):
        p1, p2, p3 = t123
        fb = jnp.where(b_ext == 65, jnp.float32(1.0), jnp.float32(0.0))
        mp12 = jnp.maximum(p1, p2)
        mx = jnp.maximum(mp12, p3)
        t1 = fb + _shift_right_neg(mx)
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        t1 = jnp.where(lane0, neg_inf, t1)
        t3 = jnp.where(lane0, -hf - gf * i, t3)
        m13 = _shift_right_neg(jnp.maximum(t1, t3))
        omega = jg + m13 - gf - hf
        pm = _lane_prefix_max(omega, nl)
        t2 = jnp.where(lane0, neg_inf, pm - jg)
        return (t1, t2, t3)

    def body(s, pq):
        t123 = _unpack3(pq, nl)
        for u in range(unroll):
            t123 = row_step(s * unroll + u + 1, t123)
        return _pack3(t123)

    pq = jax.lax.fori_loop(0, M // unroll, body, _pack3((r1, r2, r3)))
    t1, t2, t3 = _unpack3(pq, nl)
    out_ref[...] = (jnp.maximum(jnp.maximum(t1, t2), t3))[:8, :128]


def run_case(block_b, nl, unroll=4):
    kern = functools.partial(_kernel, nl=nl, block_b=block_b,
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
        rng.integers(60, 70, size=(block_b, nl)).astype(np.int32))
    try:
        np.asarray(go(b_ext))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(go(b_ext))
        dt = (time.perf_counter() - t0) / reps
        n = nl - 128  # pretend usable cols
        gcups = block_b * M * n / dt / 1e9
        vregs = block_b * nl // 1024
        print(f"block_b={block_b:3d} nl={nl:5d} unroll={unroll:2d} "
              f"({vregs:4d} vregs/tbl) {dt*1e3:9.2f} ms "
              f"{dt/M*1e9:8.0f} ns/row  {gcups:7.2f} GCUPS",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"block_b={block_b} nl={nl}: FAILED {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for block_b, nl in [(64, 2176), (32, 2176), (16, 2176), (8, 2176),
                        (64, 1088), (64, 512), (128, 2176), (256, 2176),
                        (8, 512), (16, 1088)]:
        run_case(block_b, nl)
    run_case(8, 2176, unroll=16)
    run_case(64, 2176, unroll=1)


if __name__ == "__main__":
    main()
