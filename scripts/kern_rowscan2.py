"""A/B real rowscan-kernel variants with tunnel-amortized timing.

Timing: one np.asarray sync costs ~25 ms through the axon tunnel, so
dispatch K batches back-to-back and sync once — the device queue
overlaps roundtrips and per-batch wall converges to device compute.

Variants: production kernel vs trimmed (lane0-wheres dropped where the
shift fill already produces -inf, jg-g-h folded, lbmask built in-kernel)
at block_b 64/128/256, unroll 4/8.
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
from cse305_parallel_sequence_alignment_tpu.ops import pallas_fill as pf  # noqa: E402
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (  # noqa: E402
    PAD_A,
    PAD_B,
    _char_col,
    _emit_row,
    _lane_prefix_max,
    _neg,
    _pack3,
    _shift_right_neg,
    _unpack3,
)

B, M, N = 256, 2048, 2048
NL = -(-(N + 1) // 128) * 128
MA = max(-(-M // 128) * 128, 128) + 128


def _trim_kernel(a_ref, bext_ref, lb_ref, out_ref, *, m, nl, g, h,
                 match, mismatch, unroll):
    """Trimmed uniform-la rowscan (start_type=-1 only):
    - t1/t2 lane-0 -inf flows from the shift fill (adding a finite fb to
      -3e38 stays -3e38 in f32), dropping two wheres per row;
    - omega's constant fold: jgc = j*g - g - h precomputed;
    - lbmask built in-kernel from lb (one fewer full-width input).
    """
    block_b = bext_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    lb_col = lb_ref[:, 0:1]
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)
    jgc = jg - gf - hf

    r1 = jnp.where(lane0, jnp.float32(0.0), neg_inf)
    r2 = jnp.where(lane0, neg_inf, -hf - jg)
    r3 = _neg((block_b, nl))

    def row_step(i, t123):
        p1, p2, p3 = t123
        a_col = _char_col(a_ref, i - 1)
        fb = jnp.where(b_ext == a_col, jnp.float32(match),
                       jnp.float32(mismatch))
        mp12 = jnp.maximum(p1, p2)
        t1 = fb + _shift_right_neg(jnp.maximum(mp12, p3))
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        t3 = jnp.where(lane0, -hf - gf * i, t3)
        m13 = _shift_right_neg(jnp.maximum(t1, t3))
        pm = _lane_prefix_max(jgc + m13, nl)
        t2 = pm - jg
        return (t1, t2, t3)

    def body(s, pq):
        t123 = _unpack3(pq, nl)
        for u in range(unroll):
            t123 = row_step(s * unroll + u + 1, t123)
        return _pack3(t123)

    pq = jax.lax.fori_loop(0, m // unroll, body, _pack3((r1, r2, r3)))
    t123 = _unpack3(pq, nl)
    for u in range(m % unroll):
        t123 = row_step((m // unroll) * unroll + u + 1, t123)
    lbmask = jj == lb_col
    finals = [jnp.max(jnp.where(lbmask, t, neg_inf), axis=-1,
                      keepdims=True) for t in t123]
    out_ref[...] = _emit_row(finals)


@functools.partial(jax.jit, static_argnames=(
    "m", "nl", "g", "h", "match", "mismatch", "block_b", "unroll"))
def trim_rowscan(a_pad, b_ext, lb, *, m, nl, g, h, match, mismatch,
                 block_b, unroll):
    Bp = a_pad.shape[0]
    kernel = functools.partial(
        _trim_kernel, m=m, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch), unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
    )(a_pad, b_ext, lb)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    a = rng.integers(65, 69, size=(B, M)).astype(np.uint8)
    b = rng.integers(65, 69, size=(B, N)).astype(np.uint8)
    la = np.full((B,), M, np.int32)
    lb = rng.integers(N - 200, N + 1, size=(B,)).astype(np.int32)

    # reference result through the production path
    want = pf.pallas_rowscan_score_batch(a, b, la, lb, interpret=False)

    a_pad = np.full((B, MA), int(PAD_A), np.int32)
    a_pad[:, :M] = a
    b_ext = np.full((B, NL), int(PAD_B), np.int32)
    for k in range(B):
        b_ext[k, 1: lb[k] + 1] = b[k, : lb[k]]
        b_ext[k, lb[k] + 1:] = int(PAD_B)
    lbc = np.full((B, 128), -1, np.int32)
    lbc[:, :] = lb[:, None]
    ja, jb, jlb = jnp.asarray(a_pad), jnp.asarray(b_ext), jnp.asarray(lbc)

    def timed(fn, label, reps=6):
        outs = [fn() for _ in range(2)]
        _ = [np.asarray(o) for o in outs]
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        got = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / reps
        gc = B * M * N / dt / 1e9
        ok = np.array_equal(np.asarray(got[0])[:B, :3], want)
        print(f"{label:44s} {dt*1e3:8.2f} ms/batch {gc:7.2f} GCUPS "
              f"exact={ok}", flush=True)

    # production kernel at its default block_b (=64 after fit)
    for bb in (64, 128, 256):
        for unroll in (4, 8):
            try:
                lam = np.full((B, 128), -1, np.int32)
                lam[:, :] = M
                lbm = np.zeros((B, NL), np.int32)
                lbm[np.arange(B), lb] = 1
                jlbm, jlam = jnp.asarray(lbm), jnp.asarray(lam)
                timed(lambda: pf._pallas_rowscan(
                    ja, jb, jlbm, jlam, m=M, n=N, nl=NL, g=1.0, h=2.0,
                    match=1.0, mismatch=0.0, start_type=-1, block_b=bb,
                    interpret=False, uniform_la=True, unroll=unroll),
                    f"production bb={bb} unroll={unroll}")
            except Exception as e:  # noqa: BLE001
                print(f"production bb={bb} u={unroll}: FAILED "
                      f"{type(e).__name__} {str(e)[:80]}", flush=True)
    for bb in (64, 128, 256):
        for unroll in (4, 8):
            try:
                timed(lambda: trim_rowscan(
                    ja, jb, jlb, m=M, nl=NL, g=1.0, h=2.0, match=1.0,
                    mismatch=0.0, block_b=bb, unroll=unroll),
                    f"trimmed bb={bb} unroll={unroll}")
            except Exception as e:  # noqa: BLE001
                print(f"trimmed bb={bb} u={unroll}: FAILED "
                      f"{type(e).__name__} {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
