"""Pallas TPU kernel for the overlap ("dovetail") dirs fill.

The last mode still riding the XLA wavefront for its traceback
(ops/overlap.py): suffix-prefix read overlaps with free outer ends —
T1 zero on row 0 AND column 0, best end over the last row OR last
column. Clones the row-sweep dirs pattern of ops/pallas_semiglobal.py
(_sg_rowdirs_kernel); the one structural addition is the running
last-COLUMN candidate tracking (a per-table strictly-better update, so
the earliest row — smallest anti-diagonal — wins ties exactly like the
wavefront's per-diagonal scan, ops/overlap.py:90-94).

End tie order replicated from ops/overlap.py / models.overlap
ov_oracle_best: value desc, then anti-diagonal asc, then table
T1 >= T2 >= T3, then column asc. Direction codes are the global 2-bit
codes in ROW layout (dirs[i, b, j] = cell (i, j)); the device walk
(ops/device_walk.py walk_overlap_batch_device, layout="row") and host
traceback_overlap_from_dirs consume them unchanged.
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
    _fit_block_b,
    _lane_prefix_max,
    _neg,
    _pack3,
    _shift_right_neg,
    _shift_right_zero_i,
    _unpack3,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

_BIG = 2.0 ** 24


def _ov_rowdirs_kernel(a_ref, bext_ref, la_ref, lb_ref, dirs_ref,
                       out_ref, state, fin_acc, colbest, run_state,
                       *, m, n, nl, g, h, match, mismatch, k_steps,
                       num_rows, with_runs=False, perm=False):
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _jj_perm,
        _lane_prefix_max_perm,
        _shift_right_perm,
    )
    block_b = bext_ref.shape[0]
    dblk = pl.program_id(1)
    if perm:  # permuted lane layout (pallas_fill round 5)
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
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)
    jgc = jg - gf - hf
    la3 = jnp.concatenate(
        [jnp.broadcast_to(la_col, (block_b, nl))] * 3, axis=-1)
    at_lb = jj == lb_col

    @pl.when(dblk == 0)
    def _():
        r1 = jnp.zeros((block_b, nl), jnp.float32)  # free first row
        r2 = _neg((block_b, nl))
        r3 = _neg((block_b, nl))
        state[0], state[1], state[2] = r1, r2, r3
        fin_acc[...] = jnp.where(la3 == 0, _pack3((r1, r2, r3)), neg_inf)
        # colbest rows 0-2: running last-column best value per table;
        # rows 3-5: its row index (f32)
        colbest[...] = jnp.full((6, block_b, 128), neg_inf)

    def argmax3(c1, c2, c3):
        return jnp.where((c1 >= c2) & (c1 >= c3), 0,
                         jnp.where(c2 >= c3, 1, 2))

    out_dtype = jnp.uint16 if with_runs else jnp.uint8

    @pl.when(dblk == 0)
    def _():
        if with_runs:
            run_state[...] = jnp.zeros((2, block_b, nl), jnp.int32)

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
            t1 = jnp.where(lane0, 0.0, t1)  # free first column (T1)
            t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
            t3 = jnp.where(lane0, neg_inf, t3)
            m13 = shift_neg(jnp.maximum(t1, t3))
            pm = lane_pm(jgc + m13, nl)
            t2 = jnp.where(lane0, neg_inf, pm - jg)

            d1 = shift_zero_i(argmax3(p1, p2, p3))
            d3 = argmax3(p1, p2, p3 + hf)
            d2 = shift_zero_i(argmax3(t1 - hf, t2, t3 - hf))
            packed = (d1 << DIR_T1_SHIFT) | (d2 << DIR_T2_SHIFT) | \
                (d3 << DIR_T3_SHIFT)
            if with_runs:
                # diagonal run lengths (rowdirs encoding: ca bits 6-7,
                # 8-bit run at 8-15) for the RLE device walk
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
            # last-column candidates: strictly-better keeps the
            # EARLIEST row (smallest anti-diagonal), the wavefront's
            # cross-diagonal rule (ops/overlap.py:90)
            live = (la_col >= i) & (lb_col >= 1)
            fi = jnp.float32(1.0) * i
            for k, t in enumerate((t1, t2, t3)):
                val = jnp.max(jnp.where(at_lb, t, neg_inf), axis=-1,
                              keepdims=True)
                better = (val > colbest[k][:, 0:1]) & live
                colbest[k] = jnp.where(
                    better, jnp.broadcast_to(val, (block_b, 128)),
                    colbest[k])
                colbest[3 + k] = jnp.where(
                    better, jnp.full((block_b, 128), fi),
                    colbest[3 + k])
            state[0], state[1], state[2] = t1, t2, t3

        @pl.when(i == num_rows - 1)
        def _():
            rv1, rv2, rv3 = _unpack3(fin_acc[...], nl)
            jf = jj.astype(jnp.float32)
            live = (jj >= 1) & (jj <= lb_col)
            cands_v, cands_d, cands_t, cands_j = [], [], [], []
            laf = la_col.astype(jnp.float32)
            lbf = lb_col.astype(jnp.float32)
            for k, t in enumerate((rv1, rv2, rv3)):
                tm = jnp.where(live, t, neg_inf)
                v = jnp.max(tm, axis=-1, keepdims=True)
                jmin = jnp.min(jnp.where(tm == v, jf, _BIG), axis=-1,
                               keepdims=True)
                cands_v.append(v)
                cands_d.append(laf + jmin)
                cands_t.append(jnp.full((block_b, 1), float(k + 1)))
                cands_j.append(jmin)
            for k in range(3):
                cands_v.append(colbest[k][:, 0:1])
                cands_d.append(colbest[3 + k][:, 0:1] + lbf)
                cands_t.append(jnp.full((block_b, 1), float(k + 1)))
                cands_j.append(lbf)
            V = _emit_row(cands_v)
            D = _emit_row(cands_d)
            T = _emit_row(cands_t)
            J = _emit_row(cands_j)
            vmax = jnp.max(V, axis=-1, keepdims=True)
            mask = V == vmax
            dmin = jnp.min(jnp.where(mask, D, _BIG), axis=-1,
                           keepdims=True)
            mask = mask & (D == dmin)
            tmin = jnp.min(jnp.where(mask, T, _BIG), axis=-1,
                           keepdims=True)
            mask = mask & (T == tmin)
            jmin = jnp.min(jnp.where(mask, J, _BIG), axis=-1,
                           keepdims=True)
            out_ref[...] = _emit_row([vmax, tmin, dmin - jmin, jmin])


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret", "k_steps", "with_runs",
                     "perm"))
def _pallas_ov_rowdirs(a_pad, b_ext, la, lb, *, m, n, nl, g, h, match,
                       mismatch, block_b, interpret, k_steps=8,
                       with_runs=False, perm=False):
    B = a_pad.shape[0]
    num_rows = m + 1
    num_blk = -(-num_rows // k_steps)
    grid = (B // block_b, num_blk)
    kernel = functools.partial(
        _ov_rowdirs_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
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
            pltpu.VMEM((6, block_b, 128), jnp.float32),
            pltpu.VMEM((2, block_b, nl), jnp.int32),
        ],
        interpret=interpret,
    )(a_pad, b_ext, la, lb)


def pallas_overlap_dirs_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                              match=1.0, mismatch=-1.0,
                              block_b=DEF_BLOCK_B, device_dirs=False,
                              with_runs=False, interpret=None,
                              perm=False):
    """Batched overlap fill emitting ROW-layout packed directions.

    Returns (out (B, 4) [score, end_table, end_i, end_j],
    dirs (>=m+1, B, nl) uint8 with dirs[i, b, j] = cell (i, j)) —
    value-identical to ops/overlap.py overlap_dirs_batch's outs with
    dirs in row layout (tests assert byte equality of the walks)."""
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
    dirs, out = _pallas_ov_rowdirs(
        a_pad, b_ext, la, lb, m=m, n=n, nl=nl, g=g, h=h, match=match,
        mismatch=mismatch, block_b=block_b, with_runs=with_runs,
        perm=perm, interpret=_default_interpret(interpret))
    out = np.asarray(out)[:B, :4].copy()
    # degenerate pairs (empty side): the wavefront leaves its best0
    # sentinel (NEG_INF, 1, 0, 0) — replicate
    dead = ~np.isfinite(out[:, 0]) | (out[:, 0] <= NEG_INF / 2)
    out[dead, 1:] = [1.0, 0.0, 0.0]
    if device_dirs:
        return out, dirs
    return out, np.asarray(dirs)[:, :B, :]
