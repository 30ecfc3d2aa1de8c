"""Pallas TPU kernels for the semi-global fill (ops/semiglobal.py).

Same batch-sublane x diagonal-lane mapping as ops/pallas_fill.py; the
running best over the last query row (tables T1 >= T2 >= T3, smallest
column) is tracked in VMEM scratch like the local kernel's best cell.
Returns (B, 4): [score, end_table, end_i (= len_a), end_j].
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
from cse305_parallel_sequence_alignment_tpu.ops.pallas_local import (
    _prep_sw_inputs,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A

_BIG_J = 2.0 ** 24


def _sg_diag_step(d, av, b_ext, jj, m, g, h, match, mismatch, p, q,
                  want_dirs):
    """One semi-global anti-diagonal (free T1 row 0, paid column 0)."""
    p1, p2, p3 = p
    q1, q2, q3 = q
    ii = d - jj
    interior = (jj >= 1) & (ii >= 1) & (ii <= m)
    on_row0 = ii == 0
    on_col0 = (jj == 0) & (ii >= 1) & (ii <= m)
    valid = (ii >= 0) & (ii <= m)
    neg_inf = jnp.float32(NEG_INF)

    fvec = jnp.where(av == b_ext, jnp.float32(match), jnp.float32(mismatch))
    if not want_dirs:
        # max of shifts == shift of max (identical -inf fill): one lane
        # shift per table family instead of three
        t1_int = fvec + _shift_right_neg(
            jnp.maximum(jnp.maximum(q1, q2), q3))
        t2_int = _shift_right_neg(
            jnp.maximum(jnp.maximum(p1, p3) - g - h, p2 - g))
        t3_int = jnp.maximum(jnp.maximum(p1, p2) - g - h, p3 - g)
    else:
        s1, s2, s3 = (_shift_right_neg(q1), _shift_right_neg(q2),
                      _shift_right_neg(q3))
        t1_int = fvec + jnp.maximum(jnp.maximum(s1, s2), s3)

        l1, l2, l3 = (_shift_right_neg(p1), _shift_right_neg(p2),
                      _shift_right_neg(p3))
        c2a, c2b, c2c = l1 - g - h, l2 - g, l3 - g - h
        t2_int = jnp.maximum(jnp.maximum(c2a, c2b), c2c)

        c3a, c3b, c3c = p1 - g - h, p2 - g - h, p3 - g
        t3_int = jnp.maximum(jnp.maximum(c3a, c3b), c3c)

    col0_t3 = -h - g * jnp.float32(d)  # row i = d at column 0
    t1 = jnp.where(on_row0, 0.0, jnp.where(interior, t1_int, neg_inf))
    t2 = jnp.where(interior, t2_int, neg_inf)
    t3 = jnp.where(on_col0, col0_t3, jnp.where(interior, t3_int, neg_inf))
    t1 = jnp.where(valid, t1, neg_inf)
    t2 = jnp.where(valid, t2, neg_inf)
    t3 = jnp.where(valid, t3, neg_inf)

    if not want_dirs:
        return (t1, t2, t3), None
    d1 = _first_argmax3(s1, s2, s3)
    d2 = _first_argmax3(c2a, c2b, c2c)
    d3 = _first_argmax3(c3a, c3b, c3c)
    packed = jnp.where(
        interior,
        (d1 << DIR_T1_SHIFT) | (d2 << DIR_T2_SHIFT) | (d3 << DIR_T3_SHIFT),
        0,
    )
    return (t1, t2, t3), packed


def _sg_score_kernel(a_ref, bext_ref, la_ref, lb_ref, out_ref,
                     *, m, n, nl, g, h, match, mismatch):
    block_b = bext_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    la_col = la_ref[:, 0:1].astype(jnp.float32)
    lb_col = lb_ref[:, 0:1].astype(jnp.float32)
    jf = jj.astype(jnp.float32)
    neg_inf = jnp.float32(NEG_INF)

    zero_at0 = jnp.where(jj == 0, 0.0, neg_inf)
    diag0 = (zero_at0, _neg((block_b, nl)), _neg((block_b, nl)))
    av0 = jnp.full((block_b, nl), int(PAD_A), jnp.int32)

    def body(d, carry):
        # each last-row cell (la, j) is visited exactly once (at diagonal
        # d = la + j), so the best-tracking is a pure elementwise capture
        # into a packed running row, reduced once after the loop
        pq6, rv, av = carry
        av = _push_front(av, _char_col(a_ref, d - 1))
        t123, _ = _sg_diag_step(d, av, b_ext, jj, m, g, h, match,
                                mismatch, _unpack3(pq6[:, : 3 * nl], nl),
                                _unpack3(pq6[:, 3 * nl:], nl),
                                want_dirs=False)
        ii = d - jj
        onrow = ((ii.astype(jnp.float32) == la_col) & (jj >= 1)
                 & (jf <= lb_col))
        onrow3 = jnp.concatenate([onrow] * 3, axis=-1)
        rv = jnp.where(onrow3, _pack3(t123), rv)
        return (jnp.concatenate([_pack3(t123), pq6[:, : 3 * nl]],
                                axis=-1), rv, av)

    pq6_0 = jnp.concatenate([_pack3(diag0), _neg((block_b, 3 * nl))],
                            axis=-1)
    _, rv, _ = jax.lax.fori_loop(
        1, m + n + 1, body, (pq6_0, _neg((block_b, 3 * nl)), av0))
    rv1, rv2, rv3 = _unpack3(rv, nl)
    # reduce with _sg_update_best's tie order: value desc, then column
    # asc (== earliest diagonal, d = la + j), then table T1 > T2 > T3
    cv = jnp.maximum(jnp.maximum(
        jnp.max(rv1, axis=-1, keepdims=True),
        jnp.max(rv2, axis=-1, keepdims=True)),
        jnp.max(rv3, axis=-1, keepdims=True))
    cjs = [jnp.min(jnp.where(t == cv, jf, _BIG_J), axis=-1,
                   keepdims=True) for t in (rv1, rv2, rv3)]
    cj = jnp.minimum(jnp.minimum(cjs[0], cjs[1]), cjs[2])
    ct = jnp.where(cjs[0] == cj, 1.0, jnp.where(cjs[1] == cj, 2.0, 3.0))
    out_ref[...] = _emit_row([cv, ct, la_col, cj])


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret"))
def _pallas_sg_score(a_fwd, b_ext, la, lb, *, m, n, nl, g, h, match,
                     mismatch, block_b, interpret):
    B = a_fwd.shape[0]
    grid = (B // block_b,)
    kernel = functools.partial(
        _sg_score_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
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


def pallas_semiglobal_score_batch(a_enc, b_enc, len_a, len_b, g=1.0,
                                  h=2.0, match=1.0, mismatch=-1.0,
                                  block_b=DEF_BLOCK_B, interpret=None):
    """Batched semi-global scores. Returns (B, 4): [score, end_table,
    end_i, end_j]."""
    a_fwd, b_ext, la, lb, B, m, n, nl, block_b = _prep_sw_inputs(
        a_enc, b_enc, len_a, len_b, block_b)
    out = _pallas_sg_score(
        a_fwd, b_ext, la, lb, m=m, n=n, nl=nl, g=g, h=h, match=match,
        mismatch=mismatch, block_b=block_b,
        interpret=_default_interpret(interpret))
    return np.asarray(out)[:B, :4]


def _sg_rowdirs_kernel(a_ref, bext_ref, la_ref, lb_ref, dirs_ref,
                       out_ref, state, fin_acc, run_state,
                       *, m, n, nl, g, h, match, mismatch, k_steps,
                       num_rows, with_runs=False, perm=False):
    """Row-sweep semi-global fill emitting ROW-layout packed directions.

    The global row-dirs kernel (ops/pallas_fill.py _rowdirs_kernel) with
    the semi-global boundary (T1 row 0 free/zero — reference
    ops/semiglobal.py semantics) and the last-row best reduce of
    _sg_score_kernel (value desc, column asc, table T1>T2>T3) instead of
    a corner capture. Directions pack identically, so the device walk
    and host traceback_semiglobal_from_dirs consume them unchanged
    (layout="row")."""
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _jj_perm,
        _lane_prefix_max,
        _lane_prefix_max_perm,
        _shift_right_perm,
        _shift_right_zero_i,
    )
    block_b = bext_ref.shape[0]
    dblk = pl.program_id(1)
    if perm:  # permuted lane layout (pallas_fill round 5, 1.6-1.9x)
        jj = _jj_perm(block_b, nl)
        shift_neg = lambda x: _shift_right_perm(  # noqa: E731
            x, nl, jnp.float32(NEG_INF))
        shift_zero_i = lambda x: _shift_right_perm(  # noqa: E731
            x, nl, jnp.int32(0))
        lane_pm = lambda x, _nl: _lane_prefix_max_perm(x, nl)  # noqa: E731
    else:
        jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
        shift_neg = _shift_right_neg
        shift_zero_i = _shift_right_zero_i
        lane_pm = _lane_prefix_max
    b_ext = bext_ref[...]
    la_col = la_ref[:, 0:1]
    lb_col = lb_ref[:, 0:1]
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    jg = gf * jj.astype(jnp.float32)
    jgc = jg - gf - hf
    la3 = jnp.concatenate(
        [jnp.broadcast_to(la_col, (block_b, nl))] * 3, axis=-1)

    @pl.when(dblk == 0)
    def _():
        r1 = jnp.zeros((block_b, nl), jnp.float32)  # free first row
        r2 = _neg((block_b, nl))
        r3 = _neg((block_b, nl))
        state[0], state[1], state[2] = r1, r2, r3
        fin_acc[...] = jnp.where(la3 == 0, _pack3((r1, r2, r3)), neg_inf)
        if with_runs:
            run_state[...] = jnp.zeros((2, block_b, nl), jnp.int32)

    out_dtype = jnp.uint16 if with_runs else jnp.uint8

    def argmax3(c1, c2, c3):
        return jnp.where((c1 >= c2) & (c1 >= c3), 0,
                         jnp.where(c2 >= c3, 1, 2))

    for u in range(k_steps):
        i = dblk * k_steps + u

        @pl.when((i == 0) | (i >= num_rows))
        def _(u=u):
            dirs_ref[u] = jnp.zeros((block_b, nl), jnp.int32).astype(
                out_dtype)

        @pl.when((i > 0) & (i < num_rows))
        def _(i=i, u=u):
            p1, p2, p3 = state[0], state[1], state[2]
            a_col = _char_col(a_ref, i - 1)
            fb = jnp.where(b_ext == a_col, jnp.float32(match),
                           jnp.float32(mismatch))
            mp12 = jnp.maximum(p1, p2)
            t1 = fb + shift_neg(jnp.maximum(mp12, p3))
            t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
            t3 = jnp.where(jj == 0, -hf - gf * i, t3)
            m13 = shift_neg(jnp.maximum(t1, t3))
            pm = lane_pm(jgc + m13, nl)
            t2 = pm - jg

            d1 = shift_zero_i(argmax3(p1, p2, p3))
            d3 = argmax3(p1, p2, p3 + hf)
            d2 = shift_zero_i(argmax3(t1 - hf, t2, t3 - hf))
            packed = (d1 << DIR_T1_SHIFT) | (d2 << DIR_T2_SHIFT) | \
                (d3 << DIR_T3_SHIFT)
            if with_runs:
                # diagonal run lengths (ops/pallas_fill.py rowdirs
                # encoding: ca at bits 6-7, 8-bit run at 8-15) so the
                # device walk consumes a whole run per gather round
                r_prev = shift_zero_i(run_state[0])
                ca_prev = shift_zero_i(run_state[1])
                is_run = d1 == 0
                capped = r_prev >= 255
                r_cur = jnp.where(is_run,
                                  jnp.minimum(r_prev + 1, 255), 0)
                ca_cur = jnp.where(is_run,
                                   jnp.where(capped, 0, ca_prev), d1)
                run_state[0], run_state[1] = r_cur, ca_cur
                packed = packed | (ca_cur << 6) | (r_cur << 8)
            dirs_ref[u] = packed.astype(out_dtype)

            fin_acc[...] = jnp.where(la3 == i, _pack3((t1, t2, t3)),
                                     fin_acc[...])
            state[0], state[1], state[2] = t1, t2, t3

        @pl.when(i == num_rows - 1)
        def _():
            rv1, rv2, rv3 = _unpack3(fin_acc[...], nl)
            jf = jj.astype(jnp.float32)
            live = (jj >= 1) & (jj <= lb_col)
            rv1 = jnp.where(live, rv1, neg_inf)
            rv2 = jnp.where(live, rv2, neg_inf)
            rv3 = jnp.where(live, rv3, neg_inf)
            cv = jnp.maximum(jnp.maximum(
                jnp.max(rv1, axis=-1, keepdims=True),
                jnp.max(rv2, axis=-1, keepdims=True)),
                jnp.max(rv3, axis=-1, keepdims=True))
            cjs = [jnp.min(jnp.where(t == cv, jf, _BIG_J), axis=-1,
                           keepdims=True) for t in (rv1, rv2, rv3)]
            cj = jnp.minimum(jnp.minimum(cjs[0], cjs[1]), cjs[2])
            ct = jnp.where(cjs[0] == cj, 1.0,
                           jnp.where(cjs[1] == cj, 2.0, 3.0))
            out_ref[...] = _emit_row(
                [cv, ct, la_ref[:, 0:1].astype(jnp.float32), cj])


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret", "k_steps", "with_runs",
                     "perm"))
def _pallas_sg_rowdirs(a_pad, b_ext, la, lb, *, m, n, nl, g, h, match,
                       mismatch, block_b, interpret, k_steps=8,
                       with_runs=False, perm=False):
    B = a_pad.shape[0]
    num_rows = m + 1
    num_blk = -(-num_rows // k_steps)
    grid = (B // block_b, num_blk)
    kernel = functools.partial(
        _sg_rowdirs_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch), k_steps=k_steps,
        num_rows=num_rows, with_runs=with_runs, perm=perm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k_steps, block_b, nl), lambda b, d: (d, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_blk * k_steps, B, nl),
                                 jnp.uint16 if with_runs else jnp.uint8),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, block_b, nl), jnp.float32),
            pltpu.VMEM((block_b, 3 * nl), jnp.float32),
            pltpu.VMEM((2, block_b, nl), jnp.int32),
        ],
        interpret=interpret,
    )(a_pad, b_ext, la, lb)


def pallas_semiglobal_dirs_batch(a_enc, b_enc, len_a, len_b, g=1.0,
                                 h=2.0, match=1.0, mismatch=-1.0,
                                 block_b=DEF_BLOCK_B, device_dirs=False,
                                 with_runs=False, interpret=None,
                                 perm=False):
    """Batched semi-global fill emitting ROW-layout packed directions.

    Returns (out (B, 4) [score, end_table, end_i, end_j],
    dirs (>=m+1, B, nl) uint8 with dirs[i, b, j] = cell (i, j))."""
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _fit_block_b,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_B
    a_enc = np.asarray(a_enc, np.uint8)
    b_enc = np.asarray(b_enc, np.uint8)
    B, m = a_enc.shape
    n = b_enc.shape[1]
    nl = -(-(n + 1) // 128) * 128
    ma = max(-(-m // 128) * 128, 128) + 128
    block_b = _fit_block_b(block_b, 2 * (ma + 2 * nl + 256) + 13 * nl)
    Bp = -(-B // block_b) * block_b
    a_pad = np.full((Bp, ma), int(PAD_A), np.int32)
    a_pad[:B, :m] = a_enc
    b_ext = np.full((Bp, nl), int(PAD_B), np.int32)
    b_ext[:B, 1: n + 1] = b_enc
    perm = bool(perm) and nl > 128
    if perm:
        from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill \
            import _perm_maps
        j_of_p, _ = _perm_maps(nl)
        b_ext = np.ascontiguousarray(b_ext[:, j_of_p])
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    lb = np.full((Bp, 128), -1, np.int32)
    lb[:B] = np.asarray(len_b, np.int32)[:, None]
    dirs, out = _pallas_sg_rowdirs(
        a_pad, b_ext, la, lb, m=m, n=n, nl=nl, g=g, h=h, match=match,
        mismatch=mismatch, block_b=block_b, with_runs=with_runs,
        perm=perm, interpret=_default_interpret(interpret))
    if device_dirs:
        return np.asarray(out)[:B, :4], dirs
    return np.asarray(out)[:B, :4], np.asarray(dirs)[:, :B, :]
