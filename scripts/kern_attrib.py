"""Cost attribution for the production rowscan kernel: time variants
with pieces knocked out (wrong math, same op structure) to find where
the per-row microseconds go. Run on a real chip:

    python scripts/kern_attrib.py
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
    PAD_A,
    PAD_B,
    _char_col,
    _lane_prefix_max,
    _neg,
    _pack3,
    _shift_right_neg,
    _unpack3,
)

B, M, N = 64, 2048, 2048
NL = -(-(N + 1) // 128) * 128
MA = max(-(-M // 128) * 128, 128) + 128
UNROLL = 4


def _kernel(a_ref, bext_ref, out_ref, *, knock, unroll=UNROLL):
    block_b = bext_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, NL), 1)
    b_ext = bext_ref[...]
    gf, hf = jnp.float32(1.0), jnp.float32(2.0)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)

    r1 = jnp.where(lane0, jnp.float32(0.0), neg_inf)
    r2 = jnp.where(lane0, neg_inf, -hf - gf * jj.astype(jnp.float32))
    r3 = _neg((block_b, NL))

    def row_step(i, t123):
        p1, p2, p3 = t123
        if "charcol" in knock:
            a_col = jnp.full((block_b, 1), 65, jnp.int32)
        else:
            a_col = _char_col(a_ref, i - 1)
        if "bcast" in knock:
            fb = jnp.where(b_ext == 65, jnp.float32(1.0), jnp.float32(0.0))
        else:
            fb = jnp.where(b_ext == a_col, jnp.float32(1.0),
                           jnp.float32(0.0))
        mp12 = jnp.maximum(p1, p2)
        mx = jnp.maximum(mp12, p3)
        t1 = fb + (mx if "shift1" in knock else _shift_right_neg(mx))
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        t1 = jnp.where(lane0, neg_inf, t1)
        t3 = jnp.where(lane0, -hf - gf * i, t3)
        m13x = jnp.maximum(t1, t3)
        m13 = m13x if "shift1" in knock else _shift_right_neg(m13x)
        omega = jg + m13 - gf - hf
        if "prefix" in knock:
            pm = omega
        elif "prefix7" in knock:
            pm = _lane_prefix_max(omega, 128)  # only sub-128 steps
        else:
            pm = _lane_prefix_max(omega, NL)
        t2 = jnp.where(lane0, neg_inf, pm - jg)
        return (t1, t2, t3)

    def body(s, pq):
        t123 = _unpack3(pq, NL)
        for u in range(unroll):
            t123 = row_step(s * unroll + u + 1, t123)
        return _pack3(t123)

    pq = jax.lax.fori_loop(0, M // unroll, body, _pack3((r1, r2, r3)))
    t1, t2, t3 = _unpack3(pq, NL)
    out_ref[...] = (jnp.maximum(jnp.maximum(t1, t2), t3))[:8, :128]


def run_case(name, knock, a_pad, b_ext, unroll=UNROLL):
    kern = functools.partial(_kernel, knock=knock, unroll=unroll)

    @jax.jit
    def go(a, b):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(a, b)

    try:
        np.asarray(go(a_pad, b_ext))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(go(a_pad, b_ext))
        dt = (time.perf_counter() - t0) / reps
        gcups = B * M * N / dt / 1e9
        print(f"{name:32s} {dt*1e3:9.2f} ms  {gcups:7.2f} GCUPS  "
              f"{dt/M*1e9:8.0f} ns/row", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    a = rng.integers(65, 69, size=(B, M)).astype(np.int32)
    b = rng.integers(65, 69, size=(B, N)).astype(np.int32)
    a_pad = np.full((B, MA), int(PAD_A), np.int32)
    a_pad[:, :M] = a
    b_ext = np.full((B, NL), int(PAD_B), np.int32)
    b_ext[:, 1: N + 1] = b
    a_pad, b_ext = jnp.asarray(a_pad), jnp.asarray(b_ext)

    run_case("full (baseline)", set(), a_pad, b_ext)
    run_case("full unroll=8", set(), a_pad, b_ext, unroll=8)
    run_case("full unroll=16", set(), a_pad, b_ext, unroll=16)
    run_case("- charcol", {"charcol"}, a_pad, b_ext)
    run_case("- charcol - bcast", {"charcol", "bcast"}, a_pad, b_ext)
    run_case("- prefix(12 steps)", {"prefix"}, a_pad, b_ext)
    run_case("prefix 7 sub-128 only", {"prefix7"}, a_pad, b_ext)
    run_case("- shift1 (2 shifts)", {"shift1"}, a_pad, b_ext)
    run_case("- prefix - shift1", {"prefix", "shift1"}, a_pad, b_ext)
    run_case("minimal (all knocked)",
             {"charcol", "bcast", "prefix", "shift1"}, a_pad, b_ext)


if __name__ == "__main__":
    main()
