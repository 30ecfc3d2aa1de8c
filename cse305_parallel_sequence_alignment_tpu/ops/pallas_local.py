"""Pallas TPU kernels for the Smith-Waterman local fill (ops/local.py).

Same batch-sublane x diagonal-lane mapping as ops/pallas_fill.py (int32
sequences, shift-register A window, int32 direction packing — see that
module's Mosaic ground rules), plus:
- T1 clamped at zero (edges are zero, T2/T3 stay -inf);
- the running best T1 cell tracked in VMEM scratch as (value, i, j),
  masked to each pair's true lengths; ties keep the earliest diagonal,
  then the smallest column (deterministic, matches ops/local.py);
- direction code 3 in T1's field marks "local start here".

Outputs: best (B, 3) [value, end_i, end_j] (indices as exact float32),
and for the dirs variant the skew-T packed direction matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cse305_parallel_sequence_alignment_tpu.core import (
    DIR_T1_SHIFT,
    DIR_T2_SHIFT,
    DIR_T3_SHIFT,
    NEG_INF,
)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    DEF_BLOCK_B,
    _char_col,
    _default_interpret,
    _emit_row,
    _first_argmax3,
    _neg,
    _pack3,
    _push_front,
    _shift_right_neg,
    _unpack3,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

_BIG_J = 2.0 ** 24  # larger than any representable lane index


def _sw_diag_step(d, av, b_ext, jj, m, g, h, match, mismatch, p, q,
                  want_dirs):
    """One local-mode anti-diagonal; p = diag d-1, q = diag d-2."""
    p1, p2, p3 = p
    q1, q2, q3 = q
    ii = d - jj
    interior = (jj >= 1) & (ii >= 1) & (ii <= m)
    on_edge = ((ii == 0) | (jj == 0)) & (ii >= 0) & (ii <= m)
    neg_inf = jnp.float32(NEG_INF)

    fvec = jnp.where(av == b_ext, jnp.float32(match), jnp.float32(mismatch))
    if not want_dirs:
        # max of shifts == shift of max (identical -inf fill): one lane
        # shift per table family instead of three
        t1_open = fvec + _shift_right_neg(
            jnp.maximum(jnp.maximum(q1, q2), q3))
        t1_int = jnp.maximum(t1_open, 0.0)
        t2_int = _shift_right_neg(
            jnp.maximum(jnp.maximum(p1, p3) - g - h, p2 - g))
        t3_int = jnp.maximum(jnp.maximum(p1, p2) - g - h, p3 - g)
    else:
        s1, s2, s3 = (_shift_right_neg(q1), _shift_right_neg(q2),
                      _shift_right_neg(q3))
        t1_open = fvec + jnp.maximum(jnp.maximum(s1, s2), s3)
        t1_int = jnp.maximum(t1_open, 0.0)

        l1, l2, l3 = (_shift_right_neg(p1), _shift_right_neg(p2),
                      _shift_right_neg(p3))
        c2a, c2b, c2c = l1 - g - h, l2 - g, l3 - g - h
        t2_int = jnp.maximum(jnp.maximum(c2a, c2b), c2c)

        c3a, c3b, c3c = p1 - g - h, p2 - g - h, p3 - g
        t3_int = jnp.maximum(jnp.maximum(c3a, c3b), c3c)

    t1 = jnp.where(on_edge, 0.0, jnp.where(interior, t1_int, neg_inf))
    t2 = jnp.where(interior, t2_int, neg_inf)
    t3 = jnp.where(interior, t3_int, neg_inf)

    if not want_dirs:
        return (t1, t2, t3), None
    d1 = jnp.where(t1_open > 0.0, _first_argmax3(s1, s2, s3), 3)
    d2 = _first_argmax3(c2a, c2b, c2c)
    d3 = _first_argmax3(c3a, c3b, c3c)
    packed = jnp.where(
        interior,
        (d1 << DIR_T1_SHIFT) | (d2 << DIR_T2_SHIFT) | (d3 << DIR_T3_SHIFT),
        0,
    )
    return (t1, t2, t3), packed


def _sw_update_best(best, t1, jj, d, la_col, lb_col):
    """(value, i, j) running max over in-length T1 cells; earliest (d, j)
    tie-break (strict >, then smallest winning lane)."""
    bv, bi, bj = best
    ii = d - jj
    inlen = ((jj >= 1) & (ii >= 1)
             & (ii.astype(jnp.float32) <= la_col)
             & (jj.astype(jnp.float32) <= lb_col))
    cand = jnp.where(inlen, t1, jnp.float32(NEG_INF))
    cv = jnp.max(cand, axis=-1, keepdims=True)
    jf = jj.astype(jnp.float32)
    cj = jnp.min(jnp.where(cand == cv, jf, _BIG_J), axis=-1, keepdims=True)
    better = cv > bv
    return (jnp.where(better, cv, bv),
            jnp.where(better, jnp.float32(d) - cj, bi),
            jnp.where(better, cj, bj))


def _sw_score_kernel(a_ref, bext_ref, la_ref, lb_ref, out_ref,
                     *, m, n, nl, g, h, match, mismatch):
    block_b = bext_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    la_col = la_ref[:, 0:1].astype(jnp.float32)
    lb_col = lb_ref[:, 0:1].astype(jnp.float32)
    jf = jj.astype(jnp.float32)

    zero_at0 = jnp.where(jj == 0, 0.0, jnp.float32(NEG_INF))
    diag0 = (zero_at0, _neg((block_b, nl)), _neg((block_b, nl)))
    av0 = jnp.full((block_b, nl), int(PAD_A), jnp.int32)

    def body(d, carry):
        # p (diag d-1) and q (diag d-2) ride one packed carry; the
        # running per-lane best (value | first-diagonal) rides another
        # (>= 3 large f32 carries crash this compiler — see _pack3).
        pq6, bvdv, av = carry
        av = _push_front(av, _char_col(a_ref, d - 1))
        t123, _ = _sw_diag_step(d, av, b_ext, jj, m, g, h, match, mismatch,
                                _unpack3(pq6[:, : 3 * nl], nl),
                                _unpack3(pq6[:, 3 * nl:], nl),
                                want_dirs=False)
        # elementwise running best: strict > keeps, per lane, the
        # EARLIEST diagonal attaining that lane's max (reduced once
        # after the loop — no per-step cross-lane reductions)
        bv, dv = bvdv[:, :nl], bvdv[:, nl:]
        ii = d - jj
        inlen = ((jj >= 1) & (ii >= 1)
                 & (ii.astype(jnp.float32) <= la_col) & (jf <= lb_col))
        upd = inlen & (t123[0] > bv)
        bv = jnp.where(upd, t123[0], bv)
        dv = jnp.where(upd, jnp.float32(d), dv)
        return (jnp.concatenate([_pack3(t123), pq6[:, : 3 * nl]],
                                axis=-1),
                jnp.concatenate([bv, dv], axis=-1), av)

    pq6_0 = jnp.concatenate([_pack3(diag0), _neg((block_b, 3 * nl))],
                            axis=-1)
    bvdv0 = jnp.concatenate(
        [jnp.zeros((block_b, nl), jnp.float32),
         jnp.zeros((block_b, nl), jnp.float32)], axis=-1)
    _, bvdv, _ = jax.lax.fori_loop(
        1, m + n + 1, body, (pq6_0, bvdv0, av0))
    bv, dv = bvdv[:, :nl], bvdv[:, nl:]
    # reduce: max value; earliest diagonal among max lanes; smallest
    # column within that diagonal (== _sw_update_best's tie order)
    cv = jnp.max(bv, axis=-1, keepdims=True)
    at_v = bv == cv
    dmin = jnp.min(jnp.where(at_v, dv, _BIG_J), axis=-1, keepdims=True)
    cj = jnp.min(jnp.where(at_v & (dv == dmin), jf, _BIG_J), axis=-1,
                 keepdims=True)
    zero = cv <= 0.0  # no positive cell: best stays (0, 0, 0)
    z = jnp.zeros((block_b, 1), jnp.float32)
    best = (jnp.where(zero, z, cv),
            jnp.where(zero, z, dmin - cj),
            jnp.where(zero, z, cj))
    out_ref[...] = _emit_row(list(best))


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret"))
def _pallas_sw_score(a_fwd, b_ext, la, lb, *, m, n, nl, g, h, match,
                     mismatch, block_b, interpret):
    B = a_fwd.shape[0]
    grid = (B // block_b,)
    kernel = functools.partial(
        _sw_score_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_fwd.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(a_fwd, b_ext, la, lb)


def _sw_dirs_kernel(a_ref, bext_ref, la_ref, lb_ref,
                    dirs_ref, fin_ref, state, best_acc, av_state,
                    *, m, n, nl, g, h, match, mismatch, num_d):
    block_b = bext_ref.shape[0]
    d = pl.program_id(1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    la_col = la_ref[:, 0:1].astype(jnp.float32)
    lb_col = lb_ref[:, 0:1].astype(jnp.float32)
    slot = jax.lax.rem(d, 2)

    @pl.when(d == 0)
    def _():
        zero_at0 = jnp.where(jj == 0, 0.0, jnp.float32(NEG_INF))
        neg = _neg((block_b, nl))
        state[0, 0], state[0, 1], state[0, 2] = zero_at0, neg, neg
        state[1, 0], state[1, 1], state[1, 2] = neg, neg, neg
        av_state[...] = jnp.full((block_b, nl), int(PAD_A), jnp.int32)
        dirs_ref[0] = jnp.zeros((block_b, nl), jnp.int32).astype(jnp.uint8)
        z = jnp.zeros((block_b, 1), jnp.float32)
        best_acc[0], best_acc[1], best_acc[2] = z, z, z

    @pl.when(d > 0)
    def _():
        p = (state[1 - slot, 0], state[1 - slot, 1], state[1 - slot, 2])
        q = (state[slot, 0], state[slot, 1], state[slot, 2])
        av = _push_front(av_state[...], _char_col(a_ref, d - 1))
        av_state[...] = av
        t123, packed = _sw_diag_step(d, av, b_ext, jj, m, g, h, match,
                                     mismatch, p, q, want_dirs=True)
        state[slot, 0], state[slot, 1], state[slot, 2] = t123
        dirs_ref[0] = packed.astype(jnp.uint8)
        best = _sw_update_best(
            (best_acc[0], best_acc[1], best_acc[2]), t123[0], jj, d,
            la_col, lb_col)
        best_acc[0], best_acc[1], best_acc[2] = best

    @pl.when(d == num_d - 1)
    def _():
        fin_ref[...] = _emit_row([best_acc[0], best_acc[1], best_acc[2]])


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret"))
def _pallas_sw_dirs(a_fwd, b_ext, la, lb, *, m, n, nl, g, h, match,
                    mismatch, block_b, interpret):
    B = a_fwd.shape[0]
    num_d = m + n + 1
    grid = (B // block_b, num_d)
    kernel = functools.partial(
        _sw_dirs_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch), num_d=num_d)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_fwd.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, nl), lambda b, d: (d, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_d, B, nl), jnp.uint8),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, block_b, nl), jnp.float32),
            pltpu.VMEM((3, block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, nl), jnp.int32),
        ],
        interpret=interpret,
    )(a_fwd, b_ext, la, lb)


def _prep_sw_inputs(a_enc, b_enc, len_a, len_b, block_b):
    """Lane dim padded to a 128 multiple (``nl``); lanes beyond each
    pair's len_b are excluded from best-tracking by the explicit length
    masks, so the padding is inert. int32 + forward-A layout for the
    same Mosaic reasons as pallas_fill._prep_inputs."""
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _fit_block_b,
    )

    a_enc = np.asarray(a_enc, np.uint8)
    b_enc = np.asarray(b_enc, np.uint8)
    B, m = a_enc.shape
    n = b_enc.shape[1]
    nl = -(-(n + 1) // 128) * 128
    ma = max(-(-(m + n) // 128) * 128, 128)
    block_b = _fit_block_b(block_b, 2 * (ma + nl + 384) + 10 * nl)
    Bp = -(-B // block_b) * block_b
    a_fwd = np.full((Bp, ma), int(PAD_A), np.int32)
    a_fwd[:B, :m] = a_enc
    b_ext = np.full((Bp, nl), int(PAD_B), np.int32)
    b_ext[:B, 1: n + 1] = b_enc
    la = np.zeros((Bp, 128), np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    lb = np.zeros((Bp, 128), np.int32)
    lb[:B] = np.asarray(len_b, np.int32)[:, None]
    return a_fwd, b_ext, la, lb, B, m, n, nl, block_b


def pallas_sw_score_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                          match=2.0, mismatch=-1.0, block_b=DEF_BLOCK_B,
                          interpret=None):
    """Batched local scores. Returns (B, 3): [best, end_i, end_j]."""
    a_fwd, b_ext, la, lb, B, m, n, nl, block_b = _prep_sw_inputs(
        a_enc, b_enc, len_a, len_b, block_b)
    out = _pallas_sw_score(
        a_fwd, b_ext, la, lb, m=m, n=n, nl=nl, g=g, h=h, match=match,
        mismatch=mismatch, block_b=block_b,
        interpret=_default_interpret(interpret))
    return np.asarray(out)[:B, :3]


def pallas_sw_dirs_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                         match=2.0, mismatch=-1.0, block_b=DEF_BLOCK_B,
                         device_dirs=False, interpret=None):
    """Batched local fill emitting skew-T packed directions.

    Returns (best (B, 3), dirs (m+n+1, B, n+1) uint8); with
    ``device_dirs`` the dirs array stays on the accelerator for the
    on-device walk (slow device->host link — see ops/device_walk.py)."""
    a_fwd, b_ext, la, lb, B, m, n, nl, block_b = _prep_sw_inputs(
        a_enc, b_enc, len_a, len_b, block_b)
    dirs, fin = _pallas_sw_dirs(
        a_fwd, b_ext, la, lb, m=m, n=n, nl=nl, g=g, h=h, match=match,
        mismatch=mismatch, block_b=block_b,
        interpret=_default_interpret(interpret))
    if device_dirs:
        return np.asarray(fin)[:B, :3], dirs
    return np.asarray(fin)[:B, :3], np.asarray(dirs)[:, :B, :]
