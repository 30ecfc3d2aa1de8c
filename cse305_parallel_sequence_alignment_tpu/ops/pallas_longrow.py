"""Column-chunked Pallas row-sweep fill: arbitrary-length pairs at full
kernel rate on one chip.

The plain rowscan kernel holds entire (block_b, n) rows in VMEM, capping
n at ~8-16 kb. Here the column axis is cut into chunks; one pallas call
fills all m rows of one chunk (grid over row-blocks, row state in
scratch across the sequential grid) and emits a per-row boundary record
for the next chunk:

    bnd[i-1] = [ mp_last  = max(T1,T2,T3)(i, s_last)   -> next t1 shift
                 m13_last = max(T1,T3)(i, s_last)      -> next omega
                 pm_last  = prefix-max of omega(i, <=s_last) -> T2 seed ]

(slot i-1 so producer blocks stay aligned). The wrapper loops chunks
left to right with the boundary arrays staying ON DEVICE — nothing but
the final (B, 3) leaves the chip. The T2 linearization (reference P2,
subproblem_alignment.cpp:237-325) extends across chunks exactly: the
incoming pm seeds the in-chunk prefix-max, and jg uses global column
indices so the subtraction stays consistent.

This unlocks the reference dataset's real scale (13-97 kb gene pairs,
gene_sequences_test) as batched device fills; the ppermute pipeline
(parallel/longseq.py) remains the multi-chip path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cse305_parallel_sequence_alignment_tpu.core import NEG_INF
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _char_col,
    _default_interpret,
    _emit_row,
    _lane_prefix_max,
    _neg,
    _pack3,
    _push_front,
    _unpack3,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B


def _roll_last(x):
    """(block_b, 1) copy of x's last lane (roll brings it to lane 0)."""
    return pltpu.roll(x, shift=1, axis=1)[:, 0:1]


def _bnd_col(bnd_row, k):
    """Extract scalar column k (0..2) of a (block_b, 128) boundary row."""
    block_b = bnd_row.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_b, 128), 1)
    return jnp.max(jnp.where(lane == k, bnd_row, jnp.float32(NEG_INF)),
                   axis=-1, keepdims=True)


def _row0_vals(jg_abs, g, h, start_type):
    """Row-0 T1/T2/T3 closed forms at global columns (vector jg_abs =
    g * global_j; col 0 handled by the first chunk's lane-0 fixes)."""
    neg = jnp.full(jg_abs.shape, jnp.float32(NEG_INF))
    if start_type == -2:
        t2 = -jg_abs
    elif start_type in (1, 3):
        t2 = neg
    else:
        t2 = -h - jg_abs
    return neg, t2, neg


def _longrow_kernel(a_ref, bchunk_ref, lbm_ref, la_ref, cs_ref,
                    bnd_in_ref, bnd_out_ref, fin_ref,
                    state, fin_acc, mp_carry,
                    *, m, nl_c, rc, g, h, match, mismatch, start_type,
                    first_chunk, num_rb, want_row=False):
    block_b = bchunk_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl_c), 1)
    b_ext = bchunk_ref[...]
    lbm = lbm_ref[...] != 0
    lbm3 = jnp.concatenate([lbm] * 3, axis=-1)
    la_col = la_ref[:, 0:1]
    la3 = jnp.concatenate(
        [jnp.broadcast_to(la_col, (block_b, nl_c))] * 3, axis=-1)
    cs = cs_ref[0, 0]  # global column index of this chunk's lane 0
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    jg = gf * (jj + cs).astype(jnp.float32)
    lane0 = jj == 0  # global column 0 only in the first chunk
    # grid = (batch blocks, row blocks), row innermost: the row-state
    # scratch re-initialises at r == 0 for every batch block
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        r1, r2, r3 = _row0_vals(jg, gf, hf, start_type)
        if first_chunk:
            corner1 = 0.0 if start_type in (1, -1) else NEG_INF
            corner2 = 0.0 if start_type == -2 else NEG_INF
            corner3 = 0.0 if start_type == -3 else NEG_INF
            r1 = jnp.where(lane0, jnp.float32(corner1), r1)
            r2 = jnp.where(lane0, jnp.float32(corner2), r2)
            r3 = jnp.where(lane0, jnp.float32(corner3), r3)
        row0 = _pack3((r1, r2, r3))
        state[...] = row0
        cap0 = (la3 == 0) if want_row else ((la3 == 0) & lbm3)
        fin_acc[...] = jnp.where(cap0, row0, neg_inf)
        # mp_last of row 0 at the previous chunk's last column
        # (global col cs-1): closed-form row-0 value
        csf = (cs - 1).astype(jnp.float32)
        if start_type == -2:
            mp0 = -gf * csf
        elif start_type in (1, 3):
            mp0 = neg_inf
        else:
            mp0 = -hf - gf * csf
        mp_carry[...] = jnp.full((block_b, 128), mp0, jnp.float32)

    def row_step(u, carry):
        pq, fin = carry
        p1, p2, p3 = _unpack3(pq, nl_c)
        i = r * rc + u + 1
        a_col = _char_col(a_ref, i - 1)
        fb = jnp.where(b_ext == a_col, jnp.float32(match),
                       jnp.float32(mismatch))
        mp12 = jnp.maximum(p1, p2)
        mp = jnp.maximum(mp12, p3)  # max3 of row i-1
        if first_chunk:
            t1 = fb + _push_front(mp, _neg((block_b, 1)))
        else:
            # row i-1's max3 at the previous chunk's last column:
            # u == 0 takes the carry saved by the previous row block
            mp_in = jnp.where(u == 0, mp_carry[:, 0:1],
                              _bnd_col(bnd_in_ref[
                                  jnp.maximum(u - 1, 0)], 0))
            t1 = fb + _push_front(mp, mp_in)
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        if first_chunk:
            t1 = jnp.where(lane0, neg_inf, t1)
            if start_type == -3:
                col0_3 = -gf * (r * rc + u + 1)
            elif start_type in (1, 2):
                col0_3 = neg_inf
            else:
                col0_3 = -hf - gf * (r * rc + u + 1)
            t3 = jnp.where(lane0, col0_3, t3)
        m13 = jnp.maximum(t1, t3)
        if first_chunk:
            m13s = _push_front(m13, _neg((block_b, 1)))
            pm_in = None
        else:
            bnd_i = bnd_in_ref[u]  # slot i-1: row i's boundary
            m13s = _push_front(m13, _bnd_col(bnd_i, 1))
            pm_in = _bnd_col(bnd_i, 2)
        omega = jg + m13s - gf - hf
        if first_chunk:
            omega = jnp.where(lane0, neg_inf, omega)
        pm = _lane_prefix_max(omega, nl_c)
        if pm_in is not None:
            pm = jnp.maximum(pm, pm_in)
        t2 = pm - jg
        if first_chunk:
            t2 = jnp.where(lane0, neg_inf, t2)
        t_pack = _pack3((t1, t2, t3))
        cap = (la3 == i) if want_row else ((la3 == i) & lbm3)
        fin = jnp.where(cap, t_pack, fin)
        # boundary out, slot i-1: [max3(t), max(t1,t3), pm] at last lane
        mp_t = jnp.maximum(jnp.maximum(t1, t2), t3)
        bnd_out_ref[u] = _emit_row(
            [_roll_last(mp_t), _roll_last(m13), _roll_last(pm)])
        return (t_pack, fin)

    pq, fin = jax.lax.fori_loop(
        0, rc, row_step, (state[...], fin_acc[...]))
    state[...] = pq
    fin_acc[...] = fin
    # carry for the NEXT row block's u == 0: row (r+1)*rc 's mp_in =
    # bnd_in slot (r+1)*rc - 1 = this block's last slot
    if not first_chunk:
        mp_carry[...] = jnp.broadcast_to(
            _bnd_col(bnd_in_ref[rc - 1], 0), (block_b, 128))

    @pl.when(r == num_rb - 1)
    def _():
        if want_row:
            fin_ref[...] = fin
        else:
            finals = [jnp.max(t, axis=-1, keepdims=True)
                      for t in _unpack3(fin, nl_c)]
            fin_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "nl_c", "rc", "g", "h", "match", "mismatch",
                     "start_type", "first_chunk", "block_b", "interpret",
                     "want_row"))
def _pallas_longrow(a_pad, b_chunk, lbm, la, cs, bnd_in, *, m, nl_c, rc,
                    g, h, match, mismatch, start_type, first_chunk,
                    block_b, interpret, want_row=False):
    Bp = a_pad.shape[0]
    num_rb = -(-m // rc)
    grid = (Bp // block_b, num_rb)
    kernel = functools.partial(
        _longrow_kernel, m=m, nl_c=nl_c, rc=rc, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        start_type=start_type, first_chunk=first_chunk, num_rb=num_rb,
        want_row=want_row)
    rows_pad = num_rb * rc
    fin_w = 3 * nl_c if want_row else 128
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl_c), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl_c), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rc, block_b, 128), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rc, block_b, 128), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, fin_w), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, Bp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Bp, fin_w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, 3 * nl_c), jnp.float32),
            pltpu.VMEM((block_b, 3 * nl_c), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
        ],
        interpret=interpret,
    )(a_pad, b_chunk, lbm, la, cs, bnd_in)


def pallas_long_score_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                            match=1.0, mismatch=0.0, start_type=-1,
                            chunk_cols=8192, rc=256, block_b=8,
                            interpret=None):
    """Batched score fill for arbitrary lengths via column chunking.

    Returns (B, 3) final-cell (T1, T2, T3). Boundary state between
    chunks never leaves the device.
    """
    a_enc = np.asarray(a_enc, np.uint8)
    b_enc = np.asarray(b_enc, np.uint8)
    B, m = a_enc.shape
    n = b_enc.shape[1]
    nl_c = -(-min(chunk_cols, n + 1) // 128) * 128
    Bp = -(-B // block_b) * block_b
    num_rb = -(-m // rc)
    rows_pad = num_rb * rc
    interpret = _default_interpret(interpret)

    # a padded to cover _char_col chunk loads for rows up to rows_pad
    ma = -(-(rows_pad) // 128) * 128 + 128
    a_pad = np.full((Bp, ma), int(PAD_A), np.int32)
    a_pad[:B, :m] = a_enc
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    lb = np.asarray(len_b, np.int64)

    # extended B with the '-' column at global j = 0
    b_ext_all = np.full((Bp, n + 1 + nl_c), int(PAD_B), np.int32)
    b_ext_all[:B, 1: n + 1] = b_enc

    finals = np.full((B, 3), NEG_INF, np.float32)
    bnd = jnp.zeros((rows_pad, Bp, 128), jnp.float32)
    n_chunks = -(-(n + 1) // nl_c)
    for c in range(n_chunks):
        s = c * nl_c
        b_chunk = np.ascontiguousarray(b_ext_all[:, s: s + nl_c])
        lbm = np.zeros((Bp, nl_c), np.int32)
        for k in range(B):
            if s <= lb[k] < s + nl_c:
                lbm[k, lb[k] - s] = 1
        cs = np.array([[s]], np.int32)
        bnd, fin = _pallas_longrow(
            a_pad, b_chunk, lbm, la, cs, bnd, m=rows_pad, nl_c=nl_c,
            rc=rc, g=g, h=h, match=match, mismatch=mismatch,
            start_type=start_type, first_chunk=(c == 0),
            block_b=block_b, interpret=interpret)
        fin = np.asarray(fin)[:B, :3]
        finals = np.maximum(finals, fin)
    return finals


def _row0_closed(n, g, h, start_type):
    """Host closed-form DP row 0 (3, n+1) — core.boundary_row0 semantics."""
    out = np.full((3, n + 1), NEG_INF, np.float32)
    jf = np.arange(n + 1, dtype=np.float32)
    if start_type == -2:
        out[1] = -g * jf
    elif start_type not in (1, 3):
        out[1] = -h - g * jf
    out[0, 0] = 0.0 if start_type in (1, -1) else NEG_INF
    out[1, 0] = 0.0 if start_type == -2 else NEG_INF
    out[2, 0] = 0.0 if start_type == -3 else NEG_INF
    return out


def pallas_long_lastrow(a_enc, b_enc, g=1.0, h=2.0, match=1.0,
                        mismatch=0.0, start_type=-1, chunk_cols=8192,
                        rc=256, interpret=None):
    """Last DP row (3, n+1) of one pair at kernel rate, any length.

    The partition layer's crossing-search primitive
    (parallel/partition.py crossing_on_row) for grids past the
    whole-row kernels' VMEM reach — the capability the reference's
    partition layer exists to provide (partial.cpp:81-163) delivered by
    the column-chunked fill instead of full O(m*n) tables. Per chunk the
    kernel captures row m unreduced; only (3, n+1) floats leave the
    device.
    """
    a_enc = np.asarray(a_enc, np.uint8).reshape(-1)
    b_enc = np.asarray(b_enc, np.uint8).reshape(-1)
    m, n = a_enc.shape[0], b_enc.shape[0]
    if m == 0:
        return _row0_closed(n, g, h, start_type)
    block_b = 8
    nl_c = -(-min(chunk_cols, n + 1) // 128) * 128
    # quantize the padded row count so bisection's shrinking subproblems
    # reuse compiled kernels (the capture keys on la, padding rows only
    # burn fill time)
    rq = max(rc, min(4096, 1 << (m - 1).bit_length()))
    num_rb = -(-(-(-m // rq) * rq) // rc)
    rows_pad = num_rb * rc
    interpret = _default_interpret(interpret)

    ma = -(-rows_pad // 128) * 128 + 128
    a_pad = np.full((block_b, ma), int(PAD_A), np.int32)
    a_pad[0, :m] = a_enc
    la = np.full((block_b, 128), -1, np.int32)
    la[0] = m
    b_ext_all = np.full((block_b, n + 1 + nl_c), int(PAD_B), np.int32)
    b_ext_all[0, 1: n + 1] = b_enc
    lbm = np.zeros((block_b, nl_c), np.int32)  # unused under want_row

    row = np.empty((3, n + 1), np.float32)
    bnd = jnp.zeros((rows_pad, block_b, 128), jnp.float32)
    n_chunks = -(-(n + 1) // nl_c)
    for c in range(n_chunks):
        s = c * nl_c
        b_chunk = np.ascontiguousarray(b_ext_all[:, s: s + nl_c])
        cs = np.array([[s]], np.int32)
        bnd, fin = _pallas_longrow(
            a_pad, b_chunk, lbm, la, cs, bnd, m=rows_pad, nl_c=nl_c,
            rc=rc, g=g, h=h, match=match, mismatch=mismatch,
            start_type=start_type, first_chunk=(c == 0),
            block_b=block_b, interpret=interpret, want_row=True)
        width = min(nl_c, n + 1 - s)
        chunk_row = np.asarray(fin[0]).reshape(3, nl_c)
        row[:, s: s + width] = chunk_row[:, :width]
    return row
