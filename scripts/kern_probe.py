"""Micro-probe: marginal cost of per-step vector ops inside a Mosaic
fori_loop, on the shapes the rowscan kernel actually uses.

Method: through the axon tunnel ``block_until_ready`` does not reliably
wait, and fetching the output costs ~50 ms fixed, so each case times the
kernel at two step counts with a tiny reduced output fetched via
``np.asarray`` and reports the difference quotient. Run on a real chip:

    python scripts/kern_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

BLOCK_B, NL = 64, 2176
NEGF = -3.0e38
S_LO, S_HI = 4096, 20480


def _neg(shape):
    return jnp.full(shape, NEGF, jnp.float32)


def _mk(body_op, ops, steps):
    def kernel(x_ref, y_ref, out_ref):
        y = y_ref[...]

        def body(_, x):
            for k in range(ops):
                x = body_op(x, y, k)
            return x * jnp.float32(0.5)  # keep magnitudes bounded

        x = jax.lax.fori_loop(0, steps, body, x_ref[...])
        out_ref[...] = x[:8, :128]

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


def measure(name, body_op, ops, x, y):
    try:
        lo = _time(_mk(body_op, ops, S_LO), x, y)
        hi = _time(_mk(body_op, ops, S_HI), x, y)
        per_op = (hi - lo) / ((S_HI - S_LO) * ops) * 1e9
        print(f"{name:28s} {per_op:8.1f} ns/op   "
              f"(lo={lo*1e3:.1f}ms hi={hi*1e3:.1f}ms)", flush=True)
        return per_op
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None


def op_add(x, y, k):
    return x + y


def op_mul(x, y, k):
    return x * y


def op_max(x, y, k):
    return jnp.maximum(x + y, x * jnp.float32(0.99))


def op_where(x, y, k):
    return jnp.where(x > y, x + y, y)


def _concat_shift(x, s):
    return jnp.concatenate([_neg(x.shape[:-1] + (s,)), x[..., :-s]],
                           axis=-1)


def op_concat(s):
    def f(x, y, k):
        return _concat_shift(x, s) + y
    return f


def op_roll(s):
    def f(x, y, k):
        return pltpu.roll(x, s, 1) + y
    return f


def op_roll_masked(s):
    def f(x, y, k):
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(lane >= s, pltpu.roll(x, s, 1), NEGF) + y
    return f


def op_prefix_logshift(x, y, k):
    s = 1
    while s < NL:
        x = jnp.maximum(x, _concat_shift(x, s))
        s *= 2
    return x + y  # break idempotence across steps


def op_prefix_hybrid(x, y, k):
    s = 1
    while s < 128:
        x = jnp.maximum(x, pltpu.roll(x, s, 1))
        s *= 2
    while s < NL:
        x = jnp.maximum(x, _concat_shift(x, s))
        s *= 2
    return x + y


def op_prefix_rollmask(x, y, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < NL:
        x = jnp.maximum(x, jnp.where(lane >= s, pltpu.roll(x, s, 1),
                                     NEGF))
        s *= 2
    return x + y


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BLOCK_B, NL)).astype(np.float32))
    y = jnp.asarray(
        rng.normal(size=(BLOCK_B, NL)).astype(np.float32) * 1e-6)

    cases = [
        ("add x+y", op_add, 12),
        ("mul x*y", op_mul, 12),
        ("max blend (2 ops)", op_max, 12),
        ("where (2 ops)", op_where, 12),
        ("concat s=1 +y", op_concat(1), 12),
        ("concat s=8 +y", op_concat(8), 12),
        ("concat s=64 +y", op_concat(64), 12),
        ("concat s=128 +y", op_concat(128), 12),
        ("concat s=1024 +y", op_concat(1024), 12),
        ("roll s=1 +y", op_roll(1), 12),
        ("roll s=64 +y", op_roll(64), 12),
        ("roll s=128 +y", op_roll(128), 12),
        ("roll masked s=1 +y", op_roll_masked(1), 12),
        ("FULL prefix concat", op_prefix_logshift, 1),
        ("FULL prefix hybrid", op_prefix_hybrid, 1),
        ("FULL prefix rollmask", op_prefix_rollmask, 1),
    ]
    for name, fn, ops in cases:
        measure(name, fn, ops, x, y)


if __name__ == "__main__":
    main()
