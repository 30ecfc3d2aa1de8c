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

Boundary types are DYNAMIC per pair (an int32 vector input, not a
compile-time constant): every start/end type combination the partition
layer produces (main_alignment.cpp:250-251 semantics) runs through ONE
compiled program, so the bisection's mixed-type crossing batches share
a single kernel compile.

Host<->device traffic rules (the evaluation tunnel moves ~7-9 MB/s):
sequences upload ONCE per fill as uint8 and are cast to int32 on
device (Mosaic needs 32-bit vector inputs); the per-chunk window is cut
with an on-device dynamic_slice, so the host chunk loop uploads nothing
but a 4-byte column offset per dispatch.

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
    """(block_b, 1) copy of x's last lane (roll brings it to lane 0).

    Rolls only the final 128-lane tile — a full-width roll is a whole
    VPU pass and three run per row (ops/pallas_rowcb.py measured the
    same narrowing worth ~3x on its boundary-heavy variant)."""
    return pltpu.roll(x[:, x.shape[1] - 128:], shift=1, axis=1)[:, 0:1]


def _bnd_col(bnd_row, k):
    """Extract scalar column k (0..2) of a (block_b, 128) boundary row."""
    block_b = bnd_row.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_b, 128), 1)
    return jnp.max(jnp.where(lane == k, bnd_row, jnp.float32(NEG_INF)),
                   axis=-1, keepdims=True)


def _longrow_kernel(a_ref, bchunk_ref, lbm_ref, la_ref, st_ref, cs_ref,
                    bnd_in_ref, bnd_out_ref, fin_ref,
                    state, fin_acc, mp_carry,
                    *, m, nl_c, rc, g, h, match, mismatch,
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
    # per-pair boundary type (reference start_type semantics): the
    # closed-form row-0 / col-0 boundaries become vector selects so one
    # compiled program serves every type mix in a batch
    stc = st_ref[:, 0:1]  # (block_b, 1) int32
    st_is2 = stc == -2
    st_is13 = (stc == 1) | (stc == 3)
    st_is12 = (stc == 1) | (stc == 2)
    negc = jnp.full((block_b, 1), neg_inf)
    # grid = (batch blocks, row blocks), row innermost: the row-state
    # scratch re-initialises at r == 0 for every batch block
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        # row 0 closed forms at global columns (per-pair type select)
        r1 = jnp.broadcast_to(negc, (block_b, nl_c))
        r3 = r1
        r2 = jnp.where(st_is2, -jg,
                       jnp.where(st_is13, neg_inf, -hf - jg))
        if first_chunk:
            corner1 = jnp.where((stc == 1) | (stc == -1), 0.0, neg_inf)
            corner2 = jnp.where(stc == -2, 0.0, neg_inf)
            corner3 = jnp.where(stc == -3, 0.0, neg_inf)
            r1 = jnp.where(lane0, corner1, r1)
            r2 = jnp.where(lane0, corner2, r2)
            r3 = jnp.where(lane0, corner3, r3)
        row0 = _pack3((r1, r2, r3))
        state[...] = row0
        cap0 = (la3 == 0) if want_row else ((la3 == 0) & lbm3)
        fin_acc[...] = jnp.where(cap0, row0, neg_inf)
        # mp_last of row 0 at the previous chunk's last column
        # (global col cs-1): closed-form row-0 value
        csf = (cs - 1).astype(jnp.float32)
        mp0 = jnp.where(st_is2, -gf * csf,
                        jnp.where(st_is13, neg_inf, -hf - gf * csf))
        mp_carry[...] = jnp.broadcast_to(mp0, (block_b, 128))

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
            i_f = jnp.float32(1.0) * (r * rc + u + 1)
            col0_3 = jnp.where(stc == -3, -gf * i_f,
                               jnp.where(st_is12, neg_inf,
                                         -hf - gf * i_f))
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

    # skip row blocks past every pair's la (dead ramp of a coarse
    # rows_pad bucket): scratch freezes, their bnd slots are never
    # consumed (the next chunk skips the same blocks) — this makes the
    # row quantization nearly free so fewer programs compile cold
    la_max = jnp.max(la_col)

    @pl.when(r * rc < la_max)
    def _():
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
        fin = fin_acc[...]
        if want_row:
            fin_ref[...] = fin
        else:
            finals = [jnp.max(t, axis=-1, keepdims=True)
                      for t in _unpack3(fin, nl_c)]
            fin_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "nl_c", "rc", "g", "h", "match", "mismatch",
                     "first_chunk", "block_b", "interpret", "want_row"))
def _pallas_longrow(a_u8, b_chunk_u8, lb, la, st, cs, bnd_in, *, m, nl_c,
                    rc, g, h, match, mismatch, first_chunk, block_b,
                    interpret, want_row=False):
    """One column chunk of the long fill.

    ``a_u8`` is a uint8 device array covering the full row sequences
    (upload once per fill); ``b_chunk_u8`` is THIS chunk's (Bp, nl_c)
    uint8 window, sliced host-side — a fixed shape regardless of total
    sequence length, so the compiled program is keyed only on the
    quantized (rows, nl_c) geometry and reused across chunk positions,
    bisection levels, and datasets (compiles through the evaluation
    tunnel cost minutes and the width-keyed variant recompiled per
    total-width). ``lb`` is the per-pair final-column index ((Bp, 128)
    int32, -1 to disable); the capture mask for this chunk is built on
    device from the SMEM column offset ``cs``."""
    Bp = a_u8.shape[0]
    num_rb = -(-m // rc)
    grid = (Bp // block_b, num_rb)
    a_pad = a_u8.astype(jnp.int32)
    cs0 = cs[0, 0]
    b_chunk = b_chunk_u8.astype(jnp.int32)
    lbm = (jnp.arange(nl_c, dtype=jnp.int32)[None, :] + cs0
           == lb[:, 0:1]).astype(jnp.int32)
    kernel = functools.partial(
        _longrow_kernel, m=m, nl_c=nl_c, rc=rc, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        first_chunk=first_chunk, num_rb=num_rb, want_row=want_row)
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
    )(a_pad, b_chunk, lbm, la, st, cs, bnd_in)


def _st_array(start_type, Bp):
    return np.full((Bp, 128), int(start_type), np.int32)


def pallas_long_score_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                            match=1.0, mismatch=0.0, start_type=-1,
                            chunk_cols=1024, rc=256, block_b=8,
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
    n_chunks = -(-(n + 1) // nl_c)
    interpret = _default_interpret(interpret)

    # a padded to cover _char_col chunk loads for rows up to rows_pad
    ma = -(-(rows_pad) // 128) * 128 + 128
    a_pad = np.full((Bp, ma), int(PAD_A), np.uint8)
    a_pad[:B, :m] = a_enc
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    lb = np.asarray(len_b, np.int64)

    # extended B with the '-' column at global j = 0, padded to the
    # chunk grid; chunks are sliced HOST-side so the compiled program's
    # shapes are independent of the total width
    b_all = np.full((Bp, n_chunks * nl_c), int(PAD_B), np.uint8)
    b_all[:B, 1: n + 1] = b_enc
    lb_arr = np.full((Bp, 128), -1, np.int32)
    lb_arr[:B] = lb.astype(np.int32)[:, None]

    a_dev = jnp.asarray(a_pad)
    la_dev = jnp.asarray(la)
    lb_dev = jnp.asarray(lb_arr)
    st_dev = jnp.asarray(_st_array(start_type, Bp))

    finals = np.full((B, 3), NEG_INF, np.float32)
    bnd = jnp.zeros((rows_pad, Bp, 128), jnp.float32)
    for c in range(n_chunks):
        s = c * nl_c
        b_chunk = np.ascontiguousarray(b_all[:, s: s + nl_c])
        cs = np.array([[s]], np.int32)
        bnd, fin = _pallas_longrow(
            a_dev, b_chunk, lb_dev, la_dev, st_dev, cs, bnd, m=rows_pad,
            nl_c=nl_c, rc=rc, g=g, h=h, match=match, mismatch=mismatch,
            first_chunk=(c == 0), block_b=block_b, interpret=interpret)
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


def _quant_rows(m, rc):
    """Padded row count, quantized COARSELY: {pow2 <= 2048, 4096,
    16384, then 16384 multiples}. Whole dead row-blocks are skipped in
    the kernel (la_max pl.when), so padding costs grid overhead only,
    while every distinct bucket is a ~2.5 s serial compile in a fresh
    process — the bisection's levels now share programs (e.g. 6 k and
    12 k rows both run the 16384 bucket)."""
    if m <= 2048:
        return -(-(1 << (max(m, 1) - 1).bit_length()) // rc) * rc
    if m <= 4096:
        rows = 4096
    elif m <= 16384:
        rows = 16384
    else:
        rows = -(-m // 16384) * 16384
    return -(-rows // rc) * rc


def _longrow_lastrow_fins(jobs, g, h, match, mismatch, chunk_cols, rc,
                          interpret):
    """Run the chunked fill for a batch of (a_enc, b_enc, start_type)
    jobs capturing each job's last DP row; returns (device fins list
    [(Bp, 3*nl_c) per chunk], nl_c, Bp). Rows stay ON DEVICE."""
    J = len(jobs)
    m_max = max((len(a) for a, _, _ in jobs), default=0)
    n_max = max((len(b) for _, b, _ in jobs), default=0)
    # wider batch blocks when the level has many crossings: the VPU is
    # issue-limited, so (32, 1024) ops run ~4x the rate of (8, 1024);
    # VMEM caps block_b via the full-length A rows held per pair
    block_b = 8
    ma_est = _quant_rows(max(m_max, 1), rc) + 128
    while block_b < 64 and block_b * 2 <= J and \
            2 * block_b * 4 * (ma_est + 6 * 1024) < (8 << 20):
        block_b *= 2
    Bp = -(-max(J, 1) // block_b) * block_b
    # power-of-two chunk width (<= chunk_cols): one compiled program
    # per (rows_pad, nl_c) bucket, shared across levels and datasets
    nl_c = -(-min(chunk_cols,
                  1 << max(n_max, 127).bit_length()) // 128) * 128
    rows_pad = _quant_rows(max(m_max, 1), rc)
    n_chunks = -(-(n_max + 1) // nl_c)

    ma = -(-rows_pad // 128) * 128 + 128
    a_pad = np.full((Bp, ma), int(PAD_A), np.uint8)
    la = np.full((Bp, 128), -1, np.int32)
    st = np.full((Bp, 128), -1, np.int32)
    b_all = np.full((Bp, n_chunks * nl_c), int(PAD_B), np.uint8)
    for k, (a_e, b_e, st_k) in enumerate(jobs):
        a_pad[k, : len(a_e)] = a_e
        la[k] = len(a_e)
        st[k] = int(st_k)
        b_all[k, 1: len(b_e) + 1] = b_e
    lb = np.full((Bp, 128), -1, np.int32)  # capture mask off (want_row)

    a_dev = jnp.asarray(a_pad)
    la_dev = jnp.asarray(la)
    lb_dev = jnp.asarray(lb)
    st_dev = jnp.asarray(st)

    fins = []
    bnd = jnp.zeros((rows_pad, Bp, 128), jnp.float32)
    for c in range(n_chunks):
        s = c * nl_c
        b_chunk = np.ascontiguousarray(b_all[:, s: s + nl_c])
        cs = np.array([[s]], np.int32)
        bnd, fin = _pallas_longrow(
            a_dev, b_chunk, lb_dev, la_dev, st_dev, cs, bnd, m=rows_pad,
            nl_c=nl_c, rc=rc, g=g, h=h, match=match, mismatch=mismatch,
            first_chunk=(c == 0), block_b=block_b, interpret=interpret,
            want_row=True)
        fins.append(fin)
    return fins, nl_c, Bp


def pallas_long_lastrow(a_enc, b_enc, g=1.0, h=2.0, match=1.0,
                        mismatch=0.0, start_type=-1, chunk_cols=1024,
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
    interpret = _default_interpret(interpret)
    fins, nl_c, _ = _longrow_lastrow_fins(
        [(a_enc, b_enc, start_type)], g, h, match, mismatch, chunk_cols,
        rc, interpret)
    row = np.empty((3, n + 1), np.float32)
    for c, fin in enumerate(fins):
        s = c * nl_c
        width = min(nl_c, n + 1 - s)
        if width <= 0:
            break
        chunk_row = np.asarray(fin[0]).reshape(3, nl_c)
        row[:, s: s + width] = chunk_row[:, :width]
    return row


@functools.partial(jax.jit, static_argnames=("C", "h"))
def _combine_rows(rows, n_vec, *, C, h):
    """On-device crossing combine over assembled last rows.

    ``rows``: (2C, 3, W) with row 2c = forward fill of crossing c,
    row 2c+1 = reverse fill. The optimal path crosses row i_mid of
    crossing c at argmax_j,t of T1+TR1, T2+TR2+h, T3+TR3+h (gap-open
    refund when a gap is split, partial.cpp:101-105); tie-break =
    smallest j, then table order T1,T2,T3 (matches crossing_on_row's
    lexsort). Only 3 scalars per crossing leave the device.
    """
    Ntot = rows.shape[2]
    F = rows[0: 2 * C: 2]   # (C, 3, Ntot) forward rows
    R = rows[1: 2 * C: 2]   # (C, 3, Ntot) reverse rows
    jv = jnp.arange(Ntot, dtype=jnp.int32)[None, :]     # (1, Ntot)
    n_col = n_vec[:, None]                               # (C, 1)
    ridx = jnp.clip(n_col - jv, 0, Ntot - 1)             # rev col of j
    Rrev = jnp.take_along_axis(
        R, jnp.broadcast_to(ridx[:, None, :], R.shape), axis=2)
    hoff = jnp.array([0.0, h, h], jnp.float32)[None, :, None]
    tot = F + Rrev + hoff
    valid = jv <= n_col                                  # (C, Ntot)
    tot = jnp.where(valid[:, None, :], tot, jnp.float32(NEG_INF))
    best = jnp.max(tot, axis=(1, 2))                     # (C,)
    key = jv[:, None, :] * 4 + jnp.arange(3)[None, :, None]  # j*4 + t
    key = jnp.where(tot >= best[:, None, None], key, jnp.int32(2**30))
    kmin = jnp.min(key.reshape(C, -1), axis=1)
    return kmin // 4, kmin % 4 + 1, best


@functools.partial(jax.jit, static_argnames=("nl_c", "C", "h"))
def _combine_crossings(fins, n_vec, *, nl_c, C, h):
    """_combine_rows over the batched longrow chunk captures
    ((n_chunks, Bp, 3*nl_c) stacked fins)."""
    NC, Bp, _ = fins.shape
    rows = fins.reshape(NC, Bp, 3, nl_c).transpose(1, 2, 0, 3) \
        .reshape(Bp, 3, NC * nl_c)
    return _combine_rows(rows, n_vec, C=C, h=h)


def batched_crossings(tasks, g=1.0, h=2.0, match=1.0, mismatch=0.0,
                      chunk_cols=1024, rc=256, interpret=None,
                      stair_threshold=4096):
    """Crossing points for a whole bisection level in ONE batched fill.

    ``tasks``: list of (a_enc, b_enc, i_mid, start_type, end_type).
    Each task contributes a forward job (a[:i_mid], b, start_type) and a
    reverse job (a[i_mid:] reversed, b reversed, end_type) to a single
    batched column-chunked fill; the fwd+rev combine and argmax run on
    device (_combine_crossings). Returns [(j, t, score)] per task —
    value-identical to crossing_on_row (tests assert so).
    """
    if not tasks:
        return []
    jobs = []
    for (a_e, b_e, i_mid, st, en) in tasks:
        jobs.append((np.asarray(a_e, np.uint8)[:i_mid], b_e, st))
        jobs.append((np.ascontiguousarray(
            np.asarray(a_e, np.uint8)[i_mid:][::-1]),
            np.ascontiguousarray(np.asarray(b_e, np.uint8)[::-1]), en))
    interpret = _default_interpret(interpret)
    m_max = max((len(a) for a, _, _ in jobs), default=0)
    if len(jobs) <= 4 and m_max >= stair_threshold:
        # under-filled batch at the bisection's top levels: the
        # sublane-staircase kernel fills each job at FULL utilization
        # (8 column chunks on sublanes) instead of wasting 6/8 sublanes
        from cse305_parallel_sequence_alignment_tpu.ops. \
            pallas_longstair import stair_lastrow_device
        rows = [stair_lastrow_device(
            a_e, b_e, g=g, h=h, match=match, mismatch=mismatch,
            start_type=st_j, interpret=interpret)
            for (a_e, b_e, st_j) in jobs]
        W = max(r.shape[1] for r in rows)
        rows = [jnp.pad(r, ((0, 0), (0, W - r.shape[1])),
                        constant_values=NEG_INF) for r in rows]
        C = len(tasks)
        n_vec = np.asarray([len(b) for _, b, _, _, _ in tasks],
                           np.int32)
        jb, tb, best = _combine_rows(
            jnp.stack(rows), jnp.asarray(n_vec), C=C, h=float(h))
        jb, tb, best = np.asarray(jb), np.asarray(tb), np.asarray(best)
        return [(int(jb[c]), int(tb[c]), float(best[c]))
                for c in range(C)]
    fins, nl_c, Bp = _longrow_lastrow_fins(
        jobs, g, h, match, mismatch, chunk_cols, rc, interpret)
    C = len(tasks)
    # pad the combine's static geometry (chunk count -> power of two,
    # crossings -> all Bp//2 batch slots) so the compiled program is
    # keyed on coarse buckets only — fresh compiles cost minutes here
    NC = len(fins)
    NCp = 1 << max(NC - 1, 0).bit_length() if NC > 1 else 1
    if NCp > NC:
        pad = jnp.full(fins[0].shape, jnp.float32(NEG_INF))
        fins = fins + [pad] * (NCp - NC)
    Cp = Bp // 2
    n_vec = np.zeros(Cp, np.int32)
    n_vec[:C] = [len(b) for _, b, _, _, _ in tasks]
    jb, tb, best = _combine_crossings(
        jnp.stack(fins), jnp.asarray(n_vec), nl_c=nl_c, C=Cp,
        h=float(h))
    jb, tb, best = np.asarray(jb), np.asarray(tb), np.asarray(best)
    out = []
    for c in range(C):
        # reverse row is indexed by reversed j (TR[j] = rev[n - j]) —
        # already applied in the combine's gather
        out.append((int(jb[c]), int(tb[c]), float(best[c])))
    return out
