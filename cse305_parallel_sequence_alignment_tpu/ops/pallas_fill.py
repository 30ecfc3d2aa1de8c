"""Pallas TPU kernels: batched anti-diagonal Gotoh fill.

Same mathematics as ops/wavefront.py (tested cell-identical), but the whole
sweep runs inside one Mosaic kernel so the per-diagonal step costs no XLA
dispatch:

- ``pallas_score_batch``: the entire m+n-step sweep is a ``fori_loop`` whose
  carry (two previous diagonals of T1/T2/T3 per pair) lives in
  VMEM/registers. No HBM traffic at all except sequences in, finals out.
- ``pallas_dirs_batch``: sequential grid over diagonals; packed direction
  rows stream out through the pipelined output DMA while the DP state
  ping-pongs between two VMEM scratch slots.

The batch is the sublane axis and the diagonal the lane axis, so each step
is one fused (block_b, n+1) VPU op-chain — this is how the reference's
"p threads per row" (subproblem_alignment.cpp:251-327) maps onto 8x128
vector hardware instead of fork/join.

Mosaic ground rules (verified on a real v5e in this repo's validation):
- lane-dim dynamic slices must start at provable multiples of 128, so the
  per-diagonal window of A is carried as an in-loop shift register — one
  new character per step, fetched from a 128-aligned chunk
  (``pl.multiple_of``) and isolated by a masked lane-reduce;
- sub-32-bit vector arithmetic does not lower: sequences enter the kernel
  as int32 and packed direction bytes are computed in int32 with a single
  ``astype(uint8)`` at the store.

Scores are float32 (exact for integer-valued scoring; -inf absorbing,
matching the reference's doubles). Direction layout is "skew-T":
dirs[d, b, j] holds the packed byte of cell (i=d-j, j) of pair b.
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
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

DEF_BLOCK_B = 64


def _neg(shape):
    return jnp.full(shape, jnp.float32(NEG_INF))


def _first_argmax3(c1, c2, c3):
    """Direction code (int32: uint8 math doesn't lower on Mosaic)."""
    return jnp.where(
        (c1 >= c2) & (c1 >= c3),
        0,
        jnp.where(c2 >= c3, 1, 2),
    )


def _shift_right_neg(x):
    """Lane shift right, filling -inf."""
    return jnp.concatenate([_neg(x.shape[:-1] + (1,)), x[..., :-1]], axis=-1)


def _char_col(seq_ref, idx):
    """(block_b, 1) int32 column ``seq_ref[:, idx]`` at a traced index.

    Mosaic requires lane-dim dynamic-slice starts to be provable multiples
    of 128, so load the aligned 128-lane chunk containing ``idx`` and
    isolate the wanted lane with a masked cross-lane max (sequence codes
    are < 256, so -1 is an absorbing filler). ``seq_ref``'s width must be
    a 128 multiple covering ``idx``.
    """
    block_b = seq_ref.shape[0]
    base = (idx // 128) * 128
    chunk = seq_ref[:, pl.ds(pl.multiple_of(base, 128), 128)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_b, 128), 1)
    return jnp.max(jnp.where(lane == idx - base, chunk, -1),
                   axis=-1, keepdims=True)


def _push_front(win, col):
    """Shift the lane window right by one, injecting ``col`` at lane 0."""
    return jnp.concatenate([col, win[:, :-1]], axis=-1)


def _pack3(t123):
    """Lane-concatenate the three DP tables into one carry array.

    This libtpu's compiler SIGABRTs on kernels whose fori_loop carries
    three or more (block_b, nl) float32 arrays (bisected on-device:
    2 tables compile, 3 crash in jellyfish lowering regardless of the
    ops involved), so T1/T2/T3 travel as one (block_b, 3*nl) array and
    are split at 128-aligned static offsets inside the body.
    """
    return jnp.concatenate(list(t123), axis=-1)


def _unpack3(packed, nl):
    return (packed[:, :nl], packed[:, nl: 2 * nl], packed[:, 2 * nl:])


def _emit_row(cols, width=128):
    """(block_b, width) f32 with cols[k]'s value at lane k, -inf beyond."""
    block_b = cols[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_b, width), 1)
    out = _neg((block_b, width))
    for k, c in enumerate(cols):
        out = jnp.where(lane == k, jnp.broadcast_to(c, (block_b, width)),
                        out)
    return out


def _row0_t2(jj, g, h, start_type):
    """Closed-form first-row T2 boundary (core.boundary_row0 semantics)."""
    jf = jj.astype(jnp.float32)
    if start_type == -2:
        return -g * jf
    if start_type in (1, 3):
        return _neg(jj.shape)
    return -h - g * jf


def _col0_t3(d, g, h, start_type):
    """Closed-form first-column T3 boundary at row i=d (scalar)."""
    df = jnp.float32(d)
    if start_type == -3:
        return -g * df
    if start_type in (1, 2):
        return jnp.float32(NEG_INF)
    return -h - g * df


def _diag_step(d, av, b_ext, jj, m, g, h, match, mismatch, start_type,
               p, q, want_dirs):
    """One anti-diagonal: p = diag d-1, q = diag d-2 -> diag d (+ dirs).

    ``av`` (int32) holds A's characters aligned to the diagonal:
    av[j] = a[d-1-j] (the shift-register carry), so cell (i=d-j, j)
    compares A[i-1] against B[j-1] exactly as the reference's f()
    (subproblem_alignment.h:83-88).
    """
    p1, p2, p3 = p
    q1, q2, q3 = q
    ii = d - jj
    interior = (jj >= 1) & (ii >= 1) & (ii <= m)
    on_row0 = ii == 0
    on_col0 = (jj == 0) & (ii >= 1) & (ii <= m)
    valid = (ii >= 0) & (ii <= m)
    neg_inf = jnp.float32(NEG_INF)

    fvec = jnp.where(av == b_ext, jnp.float32(match), jnp.float32(mismatch))
    s1, s2, s3 = (_shift_right_neg(q1), _shift_right_neg(q2),
                  _shift_right_neg(q3))
    t1_int = fvec + jnp.maximum(jnp.maximum(s1, s2), s3)

    l1, l2, l3 = (_shift_right_neg(p1), _shift_right_neg(p2),
                  _shift_right_neg(p3))
    c2a, c2b, c2c = l1 - g - h, l2 - g, l3 - g - h
    t2_int = jnp.maximum(jnp.maximum(c2a, c2b), c2c)

    c3a, c3b, c3c = p1 - g - h, p2 - g - h, p3 - g
    t3_int = jnp.maximum(jnp.maximum(c3a, c3b), c3c)

    row0_2 = _row0_t2(jj, g, h, start_type)
    col0_3 = _col0_t3(d, g, h, start_type)
    t1 = jnp.where(interior, t1_int, neg_inf)
    t2 = jnp.where(on_row0, row0_2, jnp.where(interior, t2_int, neg_inf))
    t3 = jnp.where(on_row0, neg_inf, jnp.where(
        on_col0, col0_3, jnp.where(interior, t3_int, neg_inf)))
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


def _capture(finals, t123, lbmask, dsum_col, d):
    """Record (T1,T2,T3) at lane len_b when d == len_a+len_b (per pair)."""
    cap = dsum_col == d  # (Bt, 1)
    picks = [jnp.max(jnp.where(lbmask, t, jnp.float32(NEG_INF)),
                     axis=-1, keepdims=True) for t in t123]
    return tuple(jnp.where(cap, pick, f) for pick, f in zip(picks, finals))


def _diag0(jj, start_type):
    """Initial diagonal d=0: the corner cell at lane 0."""
    neg = _neg(jj.shape)
    corner1 = 0.0 if start_type in (1, -1) else NEG_INF
    corner2 = 0.0 if start_type == -2 else NEG_INF
    corner3 = 0.0 if start_type == -3 else NEG_INF
    at0 = jj == 0
    return (
        jnp.where(at0, jnp.float32(corner1), neg),
        jnp.where(at0, jnp.float32(corner2), neg),
        jnp.where(at0, jnp.float32(corner3), neg),
    )


def _score_kernel(a_ref, bext_ref, lbmask_ref, dsum_ref, out_ref,
                  *, m, n, nl, g, h, match, mismatch, start_type):
    block_b = bext_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    lbmask = lbmask_ref[...] != 0
    lbmask3 = jnp.concatenate([lbmask] * 3, axis=-1)
    dsum_col = dsum_ref[:, 0:1]
    neg_inf = jnp.float32(NEG_INF)
    gf, hf = jnp.float32(g), jnp.float32(h)
    row0_2 = _row0_t2(jj, gf, hf, start_type)

    diag0 = _diag0(jj, start_type)
    fin0 = jnp.where((dsum_col == 0) & lbmask3, _pack3(diag0), neg_inf)
    av0 = jnp.full((block_b, nl), int(PAD_A), jnp.int32)

    def body(d, carry):
        # p (diag d-1) and q (diag d-2) ride one packed carry: this
        # compiler SIGABRTs at >=3 large f32 loop carries (see _pack3),
        # and the running finals array needs the third slot.
        pq6, fin, av = carry
        p1, p2, p3 = _unpack3(pq6[:, : 3 * nl], nl)
        q1, q2, q3 = _unpack3(pq6[:, 3 * nl:], nl)
        av = _push_front(av, _char_col(a_ref, d - 1))
        ii = d - jj
        interior = (jj >= 1) & (ii >= 1) & (ii <= m)
        on_row0 = ii == 0
        on_col0 = (jj == 0) & (ii >= 1) & (ii <= m)
        valid = (ii >= 0) & (ii <= m)

        fvec = jnp.where(av == b_ext, jnp.float32(match),
                         jnp.float32(mismatch))
        # max of shifts == shift of max (identical -inf fill): one lane
        # shift per table family instead of three
        t1 = fvec + _shift_right_neg(
            jnp.maximum(jnp.maximum(q1, q2), q3))
        t2 = _shift_right_neg(
            jnp.maximum(jnp.maximum(p1, p3) - gf - hf, p2 - gf))
        t3 = jnp.maximum(jnp.maximum(p1, p2) - gf - hf, p3 - gf)

        col0_3 = _col0_t3(d, gf, hf, start_type)
        t1 = jnp.where(interior, t1, neg_inf)
        t2 = jnp.where(on_row0, row0_2, jnp.where(interior, t2, neg_inf))
        t3 = jnp.where(on_row0, neg_inf, jnp.where(
            on_col0, col0_3, jnp.where(interior, t3, neg_inf)))
        t2 = jnp.where(valid, t2, neg_inf)
        t3 = jnp.where(valid, t3, neg_inf)

        t_pack = _pack3((t1, t2, t3))
        fin = jnp.where((dsum_col == d) & lbmask3, t_pack, fin)
        return (jnp.concatenate([t_pack, pq6[:, : 3 * nl]], axis=-1),
                fin, av)

    pq6_0 = jnp.concatenate(
        [_pack3(diag0), _neg((block_b, 3 * nl))], axis=-1)
    _, fin, _ = jax.lax.fori_loop(
        1, m + n + 1, body, (pq6_0, fin0, av0))
    finals = [jnp.max(t, axis=-1, keepdims=True)
              for t in _unpack3(fin, nl)]
    out_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "start_type", "block_b", "interpret"))
def _pallas_score(a_fwd, b_ext, lbmask, dsum, *, m, n, nl, g, h, match,
                  mismatch, start_type, block_b, interpret):
    B = a_fwd.shape[0]
    grid = (B // block_b,)
    kernel = functools.partial(
        _score_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        start_type=start_type)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_fwd.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(a_fwd, b_ext, lbmask, dsum)


def _dirs_kernel(a_ref, bext_ref, lbmask_ref, dsum_ref,
                 dirs_ref, fin_ref, state, fin_acc, av_state,
                 *, m, n, nl, g, h, match, mismatch, start_type, num_d,
                 k_steps):
    """``k_steps`` diagonals per grid step: one-diagonal steps leave the
    launch dominated by per-grid-step overhead (~4k steps for 2 kb
    pairs); blocking K rows into each output DMA recovers the score
    kernel's throughput while still streaming dirs to HBM."""
    block_b = bext_ref.shape[0]
    dblk = pl.program_id(1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    lbmask = lbmask_ref[...] != 0
    dsum_col = dsum_ref[:, 0:1]

    @pl.when(dblk == 0)
    def _():
        t1, t2, t3 = _diag0(jj, start_type)
        state[0, 0], state[0, 1], state[0, 2] = t1, t2, t3
        neg = _neg((block_b, nl))
        state[1, 0], state[1, 1], state[1, 2] = neg, neg, neg
        av_state[...] = jnp.full((block_b, nl), int(PAD_A), jnp.int32)
        dirs_ref[0] = jnp.zeros((block_b, nl), jnp.int32).astype(jnp.uint8)
        f = _capture(tuple(_neg((block_b, 1)) for _ in range(3)),
                     (t1, t2, t3), lbmask, dsum_col, 0)
        fin_acc[0], fin_acc[1], fin_acc[2] = f

    for u in range(k_steps):
        d = dblk * k_steps + u

        @pl.when(d > 0)
        def _(d=d, u=u):
            slot = jax.lax.rem(d, 2)
            # p = diag d-1 lives in slot 1-slot; q = diag d-2 in slot
            # (reused as the destination: ping-pong, no copies).
            p = (state[1 - slot, 0], state[1 - slot, 1],
                 state[1 - slot, 2])
            q = (state[slot, 0], state[slot, 1], state[slot, 2])
            av = _push_front(av_state[...], _char_col(a_ref, d - 1))
            av_state[...] = av
            t123, packed = _diag_step(d, av, b_ext, jj, m, g, h, match,
                                      mismatch, start_type, p, q,
                                      want_dirs=True)
            state[slot, 0], state[slot, 1], state[slot, 2] = t123
            dirs_ref[u] = packed.astype(jnp.uint8)
            f = _capture((fin_acc[0], fin_acc[1], fin_acc[2]), t123,
                         lbmask, dsum_col, d)
            fin_acc[0], fin_acc[1], fin_acc[2] = f

        @pl.when(d == num_d - 1)
        def _():
            fin_ref[...] = _emit_row([fin_acc[0], fin_acc[1],
                                      fin_acc[2]])


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "start_type", "block_b", "interpret"))
def _pallas_dirs(a_fwd, b_ext, lbmask, dsum, *, m, n, nl, g, h, match,
                 mismatch, start_type, block_b, interpret, k_steps=8):
    B = a_fwd.shape[0]
    num_d = m + n + 1
    num_blk = -(-num_d // k_steps)
    grid = (B // block_b, num_blk)
    kernel = functools.partial(
        _dirs_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        start_type=start_type, num_d=num_d, k_steps=k_steps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_fwd.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b, d: (b, 0),
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
            jax.ShapeDtypeStruct((num_blk * k_steps, B, nl), jnp.uint8),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, block_b, nl), jnp.float32),
            pltpu.VMEM((3, block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, nl), jnp.int32),
        ],
        interpret=interpret,
    )(a_fwd, b_ext, lbmask, dsum)


def _lane_prefix_max(x, nl):
    """Inclusive prefix max over lanes via log2(nl) shift-max sweeps."""
    s = 1
    while s < nl:
        shifted = jnp.concatenate(
            [_neg(x.shape[:-1] + (s,)), x[..., :-s]], axis=-1)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


# ---------------------------------------------------------------------------
# Permuted-lane layout (round 5). attrib2_r5 measured that the 7
# sub-128-lane shift-max sweeps of the in-kernel prefix-max cost ~45% of
# the whole rowscan row (removing ONLY them: 0.52-0.60x row time) while
# vreg-ALIGNED (>=128) sweeps are nearly free — unaligned lane shifts
# are the expensive Mosaic op class, not op count per se. So the row
# kernels lay DP column j at flat lane position p = T*128 + L with
# j = L*Tn + T (Tn = nl/128 tiles):
#   * shift-by-1 in j == one 128-aligned wide concat + a 1-lane shift of
#     ONE narrow (bb, 128) tile;
#   * prefix-max over j == aligned doubling over tiles (within-lane,
#     ~free) + a lane scan of the narrow per-lane-totals tile + a
#     tile-broadcast combine.
# Cell-exact vs the linear layout (finals identical; dirs identical
# after column unpermutation) and measured 1.63-1.69x on the 2 kb x 256
# headline (60-64 vs 37-38 GCUPS, scripts/probes/attrib3_r5_results
# .jsonl). b_ext / lbmask arrive host-permuted (rowscan_prep perm=True);
# jj comes from iota math so every boundary mask stays correct.
# ---------------------------------------------------------------------------


def _perm_maps(nl):
    """(j_of_p, pos_of_j) index maps for the permuted lane layout."""
    Tn = nl // 128
    p = np.arange(nl)
    j_of_p = (p % 128) * Tn + p // 128
    pos_of_j = np.empty(nl, np.int64)
    pos_of_j[j_of_p] = p
    return j_of_p, pos_of_j


def _jj_perm(block_b, nl):
    """(block_b, nl) int32 column index j at each flat lane position."""
    Tn = nl // 128
    p = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    return (p % 128) * Tn + p // 128


def _shift_right_perm(x, nl, fill):
    """Column j-1's value at column j's position (permuted layout).

    Positions with tile T>0 take from (T-1, L) — the 128-aligned
    prefix of x — and tile 0 takes from (Tn-1, L-1): the last tile
    lane-shifted by one (an 8-vreg narrow op instead of a full-width
    unaligned shift)."""
    Tn = nl // 128
    last = x[..., (Tn - 1) * 128:]
    f = jnp.full(last.shape[:-1] + (1,), fill, x.dtype)
    fix0 = jnp.concatenate([f, last[..., :-1]], axis=-1)
    return jnp.concatenate([fix0, x[..., : (Tn - 1) * 128]], axis=-1)


def _lane_prefix_max_perm(x, nl):
    """Inclusive prefix max over columns j in the permuted layout.

    Aligned doubling over tiles gives each position the max over
    T' <= T at its lane (within-lane prefix); the last tile then holds
    per-lane totals, whose EXCLUSIVE narrow lane scan is broadcast back
    across tiles. Total: log2(Tn) aligned wide sweeps + ~8 narrow
    (bb, 128) ops + one wide combine — no unaligned wide ops."""
    Tn = nl // 128
    neg_inf = jnp.float32(NEG_INF)
    s = 128
    while s < nl:
        x = jnp.maximum(x, jnp.concatenate(
            [_neg(x.shape[:-1] + (s,)), x[..., :-s]], axis=-1))
        s *= 2
    tot = x[..., (Tn - 1) * 128:]
    e = jnp.concatenate(
        [jnp.full(tot.shape[:-1] + (1,), neg_inf), tot[..., :-1]],
        axis=-1)
    s = 1
    while s < 128:
        e = jnp.maximum(e, jnp.concatenate(
            [jnp.full(e.shape[:-1] + (s,), neg_inf), e[..., :-s]],
            axis=-1))
        s *= 2
    return jnp.maximum(x, jnp.concatenate([e] * Tn, axis=-1))


def _shift_right_zero_i(x):
    """Lane shift right on int32, filling 0."""
    return jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), jnp.int32), x[..., :-1]], axis=-1)


def _rowdirs_kernel(a_ref, bext_ref, lbmask_ref, la_ref, st_ref,
                    dirs_ref, fin_ref, state, fin_acc, run_state,
                    *, m, n, nl, g, h, match, mismatch,
                    k_steps, num_rows, with_runs=False, perm=False):
    """Row-sweep fill emitting ROW-layout packed directions.

    Same mathematics as ``_rowscan_kernel`` plus per-row direction
    extraction: the reference's traceback re-derives each cell's
    predecessor by value comparisons (subproblem_alignment.cpp:147-169,
    tie order B3); here the comparisons run vectorised during the fill
    and 2-bit codes per table are packed into one byte
    (d1 | d2<<2 | d3<<4). dirs[i, b, j] holds cell (i, j) of pair b —
    half the footprint of the skew-T layout and ~7x the throughput of
    the diagonal dirs kernel (measured on v5e: the rowscan form pays
    one prefix-max instead of a ramp-wasted diagonal sweep).

    d1 compares the previous row's (T1,T2,T3) at j-1 (computed
    unshifted, then lane-shifted as int); d3 compares them at j; d2
    compares the CURRENT row's tables at j-1 (T2's prefix-max value is
    exactly max(T1-g-h, T2-g, T3-g-h) at j-1 — the linearization is
    value-exact, so the comparison semantics match the reference's).
    Lane 0 and out-of-range rows are never read by any walk, so no
    masking is spent on them.

    ``with_runs`` (the fused-walk fast path): the output is uint16 —
    bits 0-5 the packed codes, bits 8-15 the DIAGONAL RUN LENGTH
    R(i,j) (number of consecutive rec-1 steps a T1 walk takes from
    (i,j): R = c1==0 ? min(R(i-1,j-1)+1, 255) : 0, one extra lane-shift
    carry), bits 6-7 the code AFTER the run (ca = c1==0 ?
    (capped ? 0 : ca(i-1,j-1)) : c1). The device walk then consumes a
    whole diagonal run per dependent gather instead of one step
    (ops/device_walk.py _walk_core_rle) — the dependent-gather chain is
    the e2e alignment floor, and DNA paths are diagonal-run-dominated.
    """
    block_b = bext_ref.shape[0]
    dblk = pl.program_id(1)
    if perm:
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
    lbmask = lbmask_ref[...] != 0
    lbmask3 = jnp.concatenate([lbmask] * 3, axis=-1)
    la_col = la_ref[:, 0:1]
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)
    jgc = jg - gf - hf
    # per-pair boundary type (int32 vector input): the reference's
    # start_type semantics as vector selects, so ONE compiled program
    # serves every type — the partition layer's anchored segments batch
    # together and share the bench path's compiled program
    stc = st_ref[:, 0:1]
    st_is2 = stc == -2
    st_is13 = (stc == 1) | (stc == 3)
    st_is12 = (stc == 1) | (stc == 2)

    @pl.when(dblk == 0)
    def _():
        corner1 = jnp.where((stc == 1) | (stc == -1), 0.0, neg_inf)
        corner2 = jnp.where(stc == -2, 0.0, neg_inf)
        corner3 = jnp.where(stc == -3, 0.0, neg_inf)
        row0_t2 = jnp.where(st_is2, -jg,
                            jnp.where(st_is13, neg_inf, -hf - jg))
        r1 = jnp.where(lane0, corner1, neg_inf)
        r2 = jnp.where(lane0, corner2, row0_t2)
        r3 = jnp.where(lane0, corner3, neg_inf)
        state[0], state[1], state[2] = r1, r2, r3
        fin_acc[...] = jnp.where((la_col == 0) & lbmask3,
                                 _pack3((r1, r2, r3)), neg_inf)

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

        # i == 0 has no predecessors; i >= num_rows are padding rows of
        # the last block — zero both so host copies are deterministic
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
            i_f = jnp.float32(1.0) * i
            col0_3 = jnp.where(stc == -3, -gf * i_f,
                               jnp.where(st_is12, neg_inf,
                                         -hf - gf * i_f))
            t3 = jnp.where(lane0, col0_3, t3)
            m13 = shift_neg(jnp.maximum(t1, t3))
            pm = lane_pm(jgc + m13, nl)
            t2 = pm - jg

            # d1: prev row at j-1, plain tie order T1>=T2>=T3
            d1 = shift_zero_i(argmax3(p1, p2, p3))
            # d3: prev row at j, costs offset by the shared -g-h
            d3 = argmax3(p1, p2, p3 + hf)
            # d2: current row at j-1 (open-from-T1, extend, open-from-T3)
            d2 = shift_zero_i(argmax3(t1 - hf, t2, t3 - hf))
            packed = (d1 << DIR_T1_SHIFT) | (d2 << DIR_T2_SHIFT) | \
                (d3 << DIR_T3_SHIFT)
            if with_runs:
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

            t_pack = _pack3((t1, t2, t3))
            fin_acc[...] = jnp.where((la_col == i) & lbmask3, t_pack,
                                     fin_acc[...])
            state[0], state[1], state[2] = t1, t2, t3

        @pl.when(i == num_rows - 1)
        def _():
            finals = [jnp.max(t, axis=-1, keepdims=True)
                      for t in _unpack3(fin_acc[...], nl)]
            fin_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret", "k_steps",
                     "with_runs", "perm"))
def _pallas_rowdirs(a_pad, b_ext, lbmask, la, st, *, m, n, nl, g, h,
                    match, mismatch, block_b, interpret, k_steps=8,
                    with_runs=False, perm=False):
    B = a_pad.shape[0]
    num_rows = m + 1
    num_blk = -(-num_rows // k_steps)
    grid = (B // block_b, num_blk)
    kernel = functools.partial(
        _rowdirs_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        k_steps=k_steps, num_rows=num_rows,
        with_runs=with_runs, perm=perm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b, d: (b, 0),
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
    )(a_pad, b_ext, lbmask, la, st)


def pallas_rowdirs_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                         match=1.0, mismatch=0.0, start_type=-1,
                         block_b=DEF_BLOCK_B, device_dirs=False,
                         device_finals=False, interpret=None):
    """Batched row-sweep fill emitting ROW-layout packed directions.

    Returns (finals (B, 3), dirs (>=m+1, B, nl) uint8) with
    dirs[i, b, j] = packed byte of cell (i, j) — the "rect" layout of
    ops/traceback.py, batched. With ``device_dirs`` the matrix stays on
    the accelerator for ops/device_walk.py (layout="row")."""
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
    lbmask = np.zeros((Bp, nl), np.int32)
    lbmask[np.arange(B), np.asarray(len_b, np.int64)] = 1
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    st = np.full((Bp, 128), int(start_type), np.int32)
    dirs, fin = _pallas_rowdirs(
        a_pad, b_ext, lbmask, la, st, m=m, n=n, nl=nl, g=g, h=h,
        match=match, mismatch=mismatch, block_b=block_b,
        interpret=_default_interpret(interpret))
    if device_dirs:
        if device_finals:
            return fin[:B, :3], dirs  # no host sync: caller fuses
        return np.asarray(fin)[:B, :3], dirs
    return np.asarray(fin)[:B, :3], np.asarray(dirs)[:, :B, :]


def _rowscan_kernel(a_ref, bext_ref, lbmask_ref, la_ref, out_ref,
                    *, m, n, nl, g, h, match, mismatch, start_type,
                    unroll=4, uniform_la=False, perm=False):
    """Row-sweep score kernel: m steps of (block_b, nl) work with the
    prefix-max T2 linearization (reference P2) done in-kernel by
    log-shift sweeps. Unlike the diagonal kernel there is no wavefront
    ramp waste — every step's lanes are real columns — at the cost of
    ~log2(nl) extra max ops per row. The better of the two on hardware
    is an empirical question (backend="pallas_rowscan" to A/B).

    ``uniform_la``: every pair's len_a equals m (the bucketed-batch
    common case), so the per-row running capture (a 3*nl pack + select
    each row) is skipped entirely and row m's state is read once after
    the loop.

    ``perm``: permuted lane layout (see _perm_maps) — b_ext/lbmask must
    arrive column-permuted (rowscan_prep perm=True). Cell-exact,
    measured 1.63-1.69x on the 2 kb headline."""
    block_b = bext_ref.shape[0]
    if perm:
        jj = _jj_perm(block_b, nl)
        shift_neg = lambda x: _shift_right_perm(  # noqa: E731
            x, nl, jnp.float32(NEG_INF))
        lane_pm = lambda x: _lane_prefix_max_perm(x, nl)  # noqa: E731
    else:
        jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
        shift_neg = _shift_right_neg
        lane_pm = lambda x: _lane_prefix_max(x, nl)  # noqa: E731
    b_ext = bext_ref[...]
    lbmask = lbmask_ref[...] != 0
    la_col = la_ref[:, 0:1]
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)

    # row 0 boundary (core.boundary_row0 closed form)
    corner1 = 0.0 if start_type in (1, -1) else NEG_INF
    corner2 = 0.0 if start_type == -2 else NEG_INF
    corner3 = 0.0 if start_type == -3 else NEG_INF
    r1 = jnp.where(lane0, jnp.float32(corner1), neg_inf)
    r2 = jnp.where(lane0, jnp.float32(corner2),
                   _row0_t2(jj, gf, hf, start_type))
    r3 = jnp.where(lane0, jnp.float32(corner3), neg_inf)

    lbmask3 = jnp.concatenate([lbmask] * 3, axis=-1)
    fin0 = jnp.where((la_col == 0) & lbmask3, _pack3((r1, r2, r3)),
                     jnp.float32(NEG_INF))

    def row_step(i, t123):
        p1, p2, p3 = t123
        a_col = _char_col(a_ref, i - 1)
        fb = jnp.where(b_ext == a_col, jnp.float32(match),
                       jnp.float32(mismatch))
        # max of shifts == shift of max (same -inf fill): one lane shift
        # instead of three, and T3's triple as two maxes.
        mp12 = jnp.maximum(p1, p2)
        t1 = fb + shift_neg(jnp.maximum(mp12, p3))
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        t1 = jnp.where(lane0, neg_inf, t1)
        t3 = jnp.where(lane0, _col0_t3(i, gf, hf, start_type), t3)
        m13 = shift_neg(jnp.maximum(t1, t3))
        omega = jg + m13 - gf - hf  # lane 0: -inf (T2 col-0 boundary)
        pm = lane_pm(omega)
        t2 = jnp.where(lane0, neg_inf, pm - jg)
        return (t1, t2, t3)

    if uniform_la:
        # no per-row capture: run exactly m rows (unrolled chunks plus a
        # static remainder) and read the state once after the loop
        def body(s, pq):
            t123 = _unpack3(pq, nl)
            for u in range(unroll):
                t123 = row_step(s * unroll + u + 1, t123)
            return _pack3(t123)

        pq = jax.lax.fori_loop(0, m // unroll, body,
                               _pack3((r1, r2, r3)))
        t123 = _unpack3(pq, nl)
        for u in range(m % unroll):
            t123 = row_step((m // unroll) * unroll + u + 1, t123)
        finals = [jnp.max(jnp.where(lbmask, t, neg_inf),
                          axis=-1, keepdims=True) for t in t123]
        out_ref[...] = _emit_row(finals)
        return

    def capture_step(i, t123, fin):
        t123 = row_step(i, t123)
        # running elementwise capture: the cross-lane reduce happens once
        # after the loop, not every row
        fin = jnp.where((la_col == i) & lbmask3, _pack3(t123), fin)
        return t123, fin

    # several rows per fori iteration amortise loop/carry bookkeeping;
    # rows past m only compute dead state (la <= m < i, so the capture
    # mask never fires there)
    def body(s, carry):
        pq, fin = carry
        t123 = _unpack3(pq, nl)
        for u in range(unroll):
            t123, fin = capture_step(s * unroll + u + 1, t123, fin)
        return (_pack3(t123), fin)

    steps = -(-m // unroll)
    _, fin = jax.lax.fori_loop(0, steps, body,
                               (_pack3((r1, r2, r3)), fin0))
    finals = [jnp.max(t, axis=-1, keepdims=True)
              for t in _unpack3(fin, nl)]
    out_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "start_type", "block_b", "interpret", "uniform_la",
                     "unroll", "perm"))
def _pallas_rowscan(a_pad, b_ext, lbmask, la, *, m, n, nl, g, h, match,
                    mismatch, start_type, block_b, interpret,
                    uniform_la=False, unroll=4, perm=False):
    B = a_pad.shape[0]
    grid = (B // block_b,)
    kernel = functools.partial(
        _rowscan_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        start_type=start_type, uniform_la=uniform_la, unroll=unroll,
        perm=perm)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(a_pad, b_ext, lbmask, la)


def _rowscan2_kernel(a_ref, bext_ref, lbmask_ref, la_ref, out_ref,
                     *, m, n, nl, g, h, match, mismatch, start_type,
                     unroll=4, uniform_la=False):
    """Two-carry reformulation of ``_rowscan_kernel`` (same cells).

    The three-table recurrence only ever consumes the previous row
    through max(T1,T2,T3) (for T1's diagonal and T3's open) and T3
    itself (for T3's extend):

        T3[i][j] = max(max(T1,T2)[i-1][j] - g - h, T3[i-1][j] - g)
                 = max(H[i-1][j] - g - h,         T3[i-1][j] - g)

    (value-exact: max(T1,T2)-g-h and T3-g-h are both <= H-g-h, and
    T3-g >= T3-g-h, so folding T3 into H changes nothing; scores are
    integral f32 so the re-association is bit-exact). So the row carry
    is (H, T3) — two arrays instead of three — which drops the
    pack3/unpack3 shuffling and one max per row, and the loop carries
    only 2 large f32 arrays (under the Mosaic 3-carry SIGABRT limit
    without lane-packing). Redundant lane-0 masks are also gone: the
    -inf fill of the diagonal/omega lane shifts already produces the
    exact T1/T2 column-0 boundary (-inf + finite = -inf).

    Measured same-process vs ``_rowscan_kernel`` on the v5e: the pass
    count per row drops from ~34 to ~27 (see harness/perfreport.py's
    op model). Cell-identical by tests/test_rowscan.py.
    """
    block_b = bext_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    b_ext = bext_ref[...]
    lbmask = lbmask_ref[...] != 0
    la_col = la_ref[:, 0:1]
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)
    jgc = jg - gf - hf
    fmatch, fmis = jnp.float32(match), jnp.float32(mismatch)

    # row 0 boundary (core.boundary_row0 closed form)
    corner1 = 0.0 if start_type in (1, -1) else NEG_INF
    corner2 = 0.0 if start_type == -2 else NEG_INF
    corner3 = 0.0 if start_type == -3 else NEG_INF
    r1 = jnp.where(lane0, jnp.float32(corner1), neg_inf)
    r2 = jnp.where(lane0, jnp.float32(corner2),
                   _row0_t2(jj, gf, hf, start_type))
    r3 = jnp.where(lane0, jnp.float32(corner3), neg_inf)
    h0 = jnp.maximum(jnp.maximum(r1, r2), r3)

    def row_core(i, hp, t3p):
        """(H, T3) of row i-1 -> (t1, t2, t3, m13u) of row i."""
        a_col = _char_col(a_ref, i - 1)
        fb = jnp.where(b_ext == a_col, fmatch, fmis)
        t1 = fb + _shift_right_neg(hp)
        t3 = jnp.maximum(hp - gf - hf, t3p - gf)
        t3 = jnp.where(lane0, _col0_t3(i, gf, hf, start_type), t3)
        m13u = jnp.maximum(t1, t3)
        omega = jgc + _shift_right_neg(m13u)
        pm = _lane_prefix_max(omega, nl)
        t2 = pm - jg
        return t1, t2, t3, m13u

    def row_step(i, hp, t3p):
        t1, t2, t3, m13u = row_core(i, hp, t3p)
        return jnp.maximum(m13u, t2), t3

    if uniform_la:
        # rows 1..m-1 carry only (H, T3); row m runs outside the loop so
        # its full (T1, T2, T3) triple is available for the capture
        def body(s, carry):
            hp, t3p = carry
            for u in range(unroll):
                hp, t3p = row_step(s * unroll + u + 1, hp, t3p)
            return (hp, t3p)

        last = max(m - 1, 0)
        hp, t3p = jax.lax.fori_loop(0, last // unroll, body, (h0, r3))
        for u in range(last % unroll):
            hp, t3p = row_step((last // unroll) * unroll + u + 1, hp,
                               t3p)
        if m >= 1:
            t1, t2, t3, _ = row_core(m, hp, t3p)
        else:
            t1, t2, t3 = r1, r2, r3
        finals = [jnp.max(jnp.where(lbmask, t, neg_inf),
                          axis=-1, keepdims=True) for t in (t1, t2, t3)]
        out_ref[...] = _emit_row(finals)
        return

    lbmask3 = jnp.concatenate([lbmask] * 3, axis=-1)
    fin0 = jnp.where((la_col == 0) & lbmask3, _pack3((r1, r2, r3)),
                     neg_inf)

    def body(s, carry):
        hp, t3p, fin = carry
        for u in range(unroll):
            i = s * unroll + u + 1
            t1, t2, t3, m13u = row_core(i, hp, t3p)
            fin = jnp.where((la_col == i) & lbmask3,
                            _pack3((t1, t2, t3)), fin)
            hp, t3p = jnp.maximum(m13u, t2), t3
        return (hp, t3p, fin)

    steps = -(-m // unroll)
    _, _, fin = jax.lax.fori_loop(0, steps, body, (h0, r3, fin0))
    finals = [jnp.max(t, axis=-1, keepdims=True)
              for t in _unpack3(fin, nl)]
    out_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "start_type", "block_b", "interpret", "uniform_la",
                     "unroll", "perm"))
def _pallas_rowscan2(a_pad, b_ext, lbmask, la, *, m, n, nl, g, h, match,
                     mismatch, start_type, block_b, interpret,
                     uniform_la=False, unroll=4, perm=False):
    assert not perm, "rowscan2 has no permuted-layout variant"
    B = a_pad.shape[0]
    grid = (B // block_b,)
    kernel = functools.partial(
        _rowscan2_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch),
        start_type=start_type, uniform_la=uniform_la, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(a_pad, b_ext, lbmask, la)


def pallas_rowscan2_score_batch(a_enc, b_enc, len_a, len_b, g=1.0,
                                h=2.0, match=1.0, mismatch=0.0,
                                start_type=-1, block_b=DEF_BLOCK_B,
                                interpret=None):
    """Batched score-only fill via the 2-carry rowscan. (B, 3) finals."""
    B = np.asarray(a_enc).shape[0]
    args, meta = rowscan_prep(a_enc, b_enc, len_a, len_b, block_b,
                              carries=5)
    out = _pallas_rowscan2(
        *args, g=g, h=h, match=match, mismatch=mismatch,
        start_type=start_type, interpret=_default_interpret(interpret),
        **meta)
    return np.asarray(out)[:B, :3]


def rowscan_prep(a_enc, b_enc, len_a, len_b, block_b=DEF_BLOCK_B,
                 carries=7, perm=False):
    """Host-side packing for the rowscan kernels: returns
    ((a_pad, b_ext, lbmask, la), dict(m, n, nl, block_b, uniform_la,
    perm)). Split out so callers that re-dispatch on resident inputs
    (bench, streaming) pay the packing and upload once. ``carries``:
    VMEM-fit constant — 7 nl-wide carries for the score kernel, 13 for
    the rowdirs kernel. ``perm``: permute b_ext/lbmask columns into the
    fast lane layout (pair with the kernels' perm=True)."""
    a_enc = np.asarray(a_enc, np.uint8)
    b_enc = np.asarray(b_enc, np.uint8)
    B, m = a_enc.shape
    n = b_enc.shape[1]
    nl = -(-(n + 1) // 128) * 128
    # +1 tile: the unrolled kernel touches a-columns up to m+unroll-2
    ma = max(-(-m // 128) * 128, 128) + 128
    block_b = _fit_block_b(block_b, 2 * (ma + 2 * nl + 256) + carries * nl)
    Bp = -(-B // block_b) * block_b
    a_pad = np.full((Bp, ma), int(PAD_A), np.int32)
    a_pad[:B, :m] = a_enc
    b_ext = np.full((Bp, nl), int(PAD_B), np.int32)
    b_ext[:B, 1: n + 1] = b_enc
    lbmask = np.zeros((Bp, nl), np.int32)
    lbmask[np.arange(B), np.asarray(len_b, np.int64)] = 1
    perm = bool(perm) and nl > 128
    if perm:
        j_of_p, _ = _perm_maps(nl)
        b_ext = np.ascontiguousarray(b_ext[:, j_of_p])
        lbmask = np.ascontiguousarray(lbmask[:, j_of_p])
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    uniform_la = m >= 1 and bool(np.all(np.asarray(len_a) == m))
    meta = dict(m=m, n=n, nl=nl, block_b=block_b, uniform_la=uniform_la,
                perm=perm)
    return (a_pad, b_ext, lbmask, la), meta


def pallas_rowscan_score_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                               match=1.0, mismatch=0.0, start_type=-1,
                               block_b=DEF_BLOCK_B, interpret=None,
                               perm=True):
    """Batched score-only row-sweep fill. Returns (B, 3) finals.

    ``perm``: permuted lane layout (default — 1.63x on hardware,
    attrib3_r5_results.jsonl); finals are layout-independent."""
    B = np.asarray(a_enc).shape[0]
    args, meta = rowscan_prep(a_enc, b_enc, len_a, len_b, block_b,
                              perm=perm)
    out = _pallas_rowscan(
        *args, g=g, h=h, match=match, mismatch=mismatch,
        start_type=start_type, interpret=_default_interpret(interpret),
        **meta)
    return np.asarray(out)[:B, :3]


def _submat_kernel(a_ref, prof_ref, lbmask_ref, la_ref, out_ref,
                   *, m, n, nl, k1, g, h, start_type):
    """Row-sweep fill under a substitution matrix.

    Mosaic has no vector gather, so the classic query-profile technique
    applies: the host pre-gathers prof[k, j] = table[k, B[j]] and the
    kernel resolves f(A[i], B[j]) with k1-1 lane selects keyed on A's
    code (reference f(): subproblem_alignment.h:83-88 generalised to a
    full matrix). Everything else mirrors _rowscan_kernel.
    """
    block_b = lbmask_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (block_b, nl), 1)
    lbmask = lbmask_ref[...] != 0
    la_col = la_ref[:, 0:1]
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    lane0 = jj == 0
    jg = gf * jj.astype(jnp.float32)

    corner1 = 0.0 if start_type in (1, -1) else NEG_INF
    corner2 = 0.0 if start_type == -2 else NEG_INF
    corner3 = 0.0 if start_type == -3 else NEG_INF
    r1 = jnp.where(lane0, jnp.float32(corner1), neg_inf)
    r2 = jnp.where(lane0, jnp.float32(corner2),
                   _row0_t2(jj, gf, hf, start_type))
    r3 = jnp.where(lane0, jnp.float32(corner3), neg_inf)

    lbmask3 = jnp.concatenate([lbmask] * 3, axis=-1)
    fin0 = jnp.where((la_col == 0) & lbmask3, _pack3((r1, r2, r3)),
                     neg_inf)
    prof = prof_ref[...]

    def body(i, carry):
        pq, fin = carry
        p1, p2, p3 = _unpack3(pq, nl)
        a_col = _char_col(a_ref, i - 1)
        fb = prof[:, :nl]
        for k in range(1, k1):
            fb = jnp.where(a_col == k, prof[:, k * nl: (k + 1) * nl], fb)
        mp12 = jnp.maximum(p1, p2)
        t1 = fb + _shift_right_neg(jnp.maximum(mp12, p3))
        t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
        t1 = jnp.where(lane0, neg_inf, t1)
        t3 = jnp.where(lane0, _col0_t3(i, gf, hf, start_type), t3)
        m13 = _shift_right_neg(jnp.maximum(t1, t3))
        omega = jg + m13 - gf - hf
        pm = _lane_prefix_max(omega, nl)
        t2 = jnp.where(lane0, neg_inf, pm - jg)
        t_pack = _pack3((t1, t2, t3))
        fin = jnp.where((la_col == i) & lbmask3, t_pack, fin)
        return (t_pack, fin)

    _, fin = jax.lax.fori_loop(1, m + 1, body,
                               (_pack3((r1, r2, r3)), fin0))
    finals = [jnp.max(t, axis=-1, keepdims=True)
              for t in _unpack3(fin, nl)]
    out_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "k1", "g", "h", "start_type",
                     "block_b", "interpret"))
def _pallas_submat(a_pad, prof, lbmask, la, *, m, n, nl, k1, g, h,
                   start_type, block_b, interpret):
    B = a_pad.shape[0]
    grid = (B // block_b,)
    kernel = functools.partial(
        _submat_kernel, m=m, n=n, nl=nl, k1=k1, g=float(g), h=float(h),
        start_type=start_type)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, k1 * nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(a_pad, prof, lbmask, la)


def pallas_submat_score_batch(a_codes, b_codes, len_a, len_b, table,
                              g=1.0, h=2.0, start_type=-1,
                              block_b=DEF_BLOCK_B, interpret=None):
    """Batched substitution-matrix score fill. Returns (B, 3) finals.

    ``a_codes``/``b_codes``: (B, m)/(B, n) uint8 alphabet codes padded
    with ``k1 - 1`` (the matrix pad code); ``table``: (k1, k1) float
    lookup (core.SubstitutionMatrix.table())."""
    a_codes = np.asarray(a_codes, np.uint8)
    b_codes = np.asarray(b_codes, np.uint8)
    table = np.asarray(table, np.float32)
    k1 = table.shape[0]
    B, m = a_codes.shape
    n = b_codes.shape[1]
    nl = -(-(n + 1) // 128) * 128
    ma = max(-(-m // 128) * 128, 128)
    block_b = _fit_block_b(
        block_b, 2 * (ma + (k1 + 1) * nl + 128) + 7 * nl)
    Bp = -(-B // block_b) * block_b
    a_pad = np.full((Bp, ma), k1 - 1, np.int32)
    a_pad[:B, :m] = a_codes
    b_ext = np.full((Bp, nl), k1 - 1, np.int64)
    b_ext[:B, 1: n + 1] = b_codes
    # prof[:, k*nl + j] = table[k, b_ext[j]]
    prof = np.ascontiguousarray(
        table[:, b_ext].transpose(1, 0, 2).reshape(Bp, k1 * nl))
    lbmask = np.zeros((Bp, nl), np.int32)
    lbmask[np.arange(B), np.asarray(len_b, np.int64)] = 1
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    out = _pallas_submat(
        a_pad, prof, lbmask, la, m=m, n=n, nl=nl, k1=k1, g=g, h=h,
        start_type=start_type, block_b=block_b,
        interpret=_default_interpret(interpret))
    return np.asarray(out)[:B, :3]


def _prep_inputs(a_enc, b_enc, len_a, len_b, block_b):
    """Host-side packing: forward A (int32), extended B, masks, batch pad.

    The lane dimension is padded to a multiple of 128 (``nl``) so every
    vector op runs on full tiles; lanes beyond n are never interior and
    the fvec compare sees PAD_A vs PAD_B. Sequences are widened to int32
    because Mosaic has no sub-32-bit vector arithmetic. A is laid out
    forward, padded with PAD_A out to a 128 multiple covering index
    m+n-1, because kernels fetch one character per diagonal step
    (``_char_col``) into a shift register rather than dynamically slicing
    an unaligned window (illegal on Mosaic).
    """
    a_enc = np.asarray(a_enc, np.uint8)
    b_enc = np.asarray(b_enc, np.uint8)
    B, m = a_enc.shape
    n = b_enc.shape[1]
    nl = -(-(n + 1) // 128) * 128
    ma = max(-(-(m + n) // 128) * 128, 128)
    block_b = _fit_block_b(block_b, 2 * (ma + 2 * nl + 256) + 10 * nl)
    Bp = -(-B // block_b) * block_b

    a_fwd = np.full((Bp, ma), int(PAD_A), np.int32)
    a_fwd[:B, :m] = a_enc
    b_ext = np.full((Bp, nl), int(PAD_B), np.int32)
    b_ext[:B, 1: n + 1] = b_enc
    lbmask = np.zeros((Bp, nl), np.int32)
    lbmask[np.arange(B), np.asarray(len_b, np.int64)] = 1
    dsum = np.full((Bp, 128), -1, np.int32)
    dsum[:B] = (np.asarray(len_a, np.int64)
                + np.asarray(len_b, np.int64))[:, None].astype(np.int32)
    return a_fwd, b_ext, lbmask, dsum, B, m, n, nl, block_b


def _default_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fit_block_b(block_b, lanes_per_row, budget_bytes=12 << 20):
    """Halve block_b until one block's VMEM footprint fits.

    ``lanes_per_row`` counts 4-byte lanes per batch row: double-buffered
    inputs (Mosaic prefetches the next grid block) plus loop carries.
    v5e VMEM is ~16 MB/core; 12 MB leaves headroom for temporaries.
    """
    while block_b > 8 and block_b * 4 * lanes_per_row > budget_bytes:
        block_b //= 2
    return block_b


def pallas_score_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0, match=1.0,
                       mismatch=0.0, start_type=-1, block_b=DEF_BLOCK_B,
                       interpret=None):
    """Batched score-only fill. Returns (B, 3) final-cell (T1, T2, T3)."""
    a_fwd, b_ext, lbmask, dsum, B, m, n, nl, block_b = _prep_inputs(
        a_enc, b_enc, len_a, len_b, block_b)
    out = _pallas_score(
        a_fwd, b_ext, lbmask, dsum, m=m, n=n, nl=nl, g=g, h=h,
        match=match, mismatch=mismatch, start_type=start_type,
        block_b=block_b, interpret=_default_interpret(interpret))
    return np.asarray(out)[:B, :3]


def pallas_dirs_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0, match=1.0,
                      mismatch=0.0, start_type=-1, block_b=DEF_BLOCK_B,
                      device_dirs=False, interpret=None):
    """Batched fill emitting skew-T packed directions.

    Returns (finals (B, 3), dirs (m+n+1, B, n+1) uint8); cell (i, j) of
    pair b is dirs[i+j, b, j]. With ``device_dirs`` the dirs array stays
    on the accelerator (ops/device_walk.py walks it there; the batch-pad
    rows are left in, harmless) — fetching hundreds of MB through a slow
    device->host link is the full-alignment bottleneck otherwise."""
    a_fwd, b_ext, lbmask, dsum, B, m, n, nl, block_b = _prep_inputs(
        a_enc, b_enc, len_a, len_b, block_b)
    dirs, fin = _pallas_dirs(
        a_fwd, b_ext, lbmask, dsum, m=m, n=n, nl=nl, g=g, h=h,
        match=match, mismatch=mismatch, start_type=start_type,
        block_b=block_b, interpret=_default_interpret(interpret))
    if device_dirs:
        return np.asarray(fin)[:B, :3], dirs
    return np.asarray(fin)[:B, :3], np.asarray(dirs)[:, :B, :]
