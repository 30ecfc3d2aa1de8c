"""Probe 2 (corrected): all kernels end in a FULL reduce so the
compiler cannot slice-narrow the loop body (earlier probes output a
tiny slice and elementwise chains were narrowed to ~nothing).

Measures, with real full-cone work:
  (a) elementwise op throughput at production widths
  (b) lane-axis vs sublane-axis shift cost
  (c) full 12-step prefix-max in row layout vs transposed layout
  (d) the _pack3 carry concatenate cost
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

NEGF = -3.0e38
S_LO, S_HI = 512, 2560


def _mk(body_op, ops, steps, shape):
    def kernel(x_ref, y_ref, out_ref):
        y = y_ref[...]

        def body(_, x):
            for k in range(ops):
                x = body_op(x, y, k)
            return jnp.maximum(x * jnp.float32(0.5), jnp.float32(-1e30))

        x = jax.lax.fori_loop(0, steps, body, x_ref[...])
        out_ref[...] = jnp.full((8, 128), jnp.max(x))

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x, y)

    return run


def _time(run, x, y, reps=3):
    np.asarray(run(x, y))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(x, y))
    return (time.perf_counter() - t0) / reps


def measure(name, body_op, ops, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 1e-3)
    try:
        lo = _time(_mk(body_op, ops, S_LO, shape), x, y)
        hi = _time(_mk(body_op, ops, S_HI, shape), x, y)
        per_op = (hi - lo) / ((S_HI - S_LO) * ops) * 1e9
        print(f"{name:44s} {per_op:8.1f} ns/op", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:90]}",
              flush=True)


def op_chain(x, y, k):
    return jnp.maximum(x * jnp.float32(0.99), y + x)


def op_lane_concat(s):
    def f(x, y, k):
        pad = jnp.full(x.shape[:-1] + (s,), NEGF, jnp.float32)
        return jnp.concatenate([pad, x[..., :-s]], axis=-1) + y
    return f


def op_sub_concat(s):
    def f(x, y, k):
        pad = jnp.full((s,) + x.shape[1:], NEGF, jnp.float32)
        return jnp.concatenate([pad, x[:-s]], axis=0) + y
    return f


def op_sub_roll(s):
    def f(x, y, k):
        return pltpu.roll(x, s, 0) + y
    return f


def op_prefix_lane(x, y, k):
    n = x.shape[-1]
    s = 1
    while s < n:
        pad = jnp.full(x.shape[:-1] + (s,), NEGF, jnp.float32)
        x = jnp.maximum(x, jnp.concatenate([pad, x[..., :-s]], axis=-1))
        s *= 2
    return x + y


def op_prefix_sub(x, y, k):
    n = x.shape[0]
    s = 1
    while s < n:
        pad = jnp.full((s,) + x.shape[1:], NEGF, jnp.float32)
        x = jnp.maximum(x, jnp.concatenate([pad, x[:-s]], axis=0))
        s *= 2
    return x + y


def op_packunpack(x, y, k):
    # emulate _pack3/_unpack3 round trip on thirds of the lane dim
    nl = x.shape[-1] // 3
    a, b, c = x[:, :nl], x[:, nl:2 * nl], x[:, 2 * nl:]
    a = a + y[:, :nl]
    b = jnp.maximum(b, a)
    c = c + b
    return jnp.concatenate([a, b, c], axis=-1)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    measure("elementwise chain (256,2176) 2op", op_chain, 16,
            (256, 2176))
    measure("elementwise chain (64,2176) 2op", op_chain, 16, (64, 2176))
    measure("elementwise chain (2176,256) 2op", op_chain, 16,
            (2176, 256))
    measure("lane concat s=1 (256,2176)", op_lane_concat(1), 12,
            (256, 2176))
    measure("lane concat s=64 (256,2176)", op_lane_concat(64), 12,
            (256, 2176))
    measure("lane concat s=128 (256,2176)", op_lane_concat(128), 12,
            (256, 2176))
    measure("sublane concat s=1 (2176,256)", op_sub_concat(1), 12,
            (2176, 256))
    measure("sublane concat s=8 (2176,256)", op_sub_concat(8), 12,
            (2176, 256))
    measure("sublane concat s=64 (2176,256)", op_sub_concat(64), 12,
            (2176, 256))
    measure("sublane roll s=1 (2176,256)", op_sub_roll(1), 12,
            (2176, 256))
    measure("FULL prefix lane (256,2176)", op_prefix_lane, 1,
            (256, 2176))
    measure("FULL prefix lane (64,2176)", op_prefix_lane, 1, (64, 2176))
    measure("FULL prefix sublane (2176,256)", op_prefix_sub, 1,
            (2176, 256))
    measure("FULL prefix sublane (2176,64)", op_prefix_sub, 1,
            (2176, 64))
    measure("pack3/unpack3 roundtrip (256,6528)", op_packunpack, 4,
            (256, 6528))


if __name__ == "__main__":
    main()
