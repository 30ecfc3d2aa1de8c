"""Halo-staircase Pallas kernel: the sharded long-sequence pipeline's
per-device fill at kernel rate.

parallel/longseq.py's original per-device body was a pure-XLA
``lax.scan`` over rows — ~0.24 GCUPS on a v5e, ~125x below the Pallas
fills (VERDICT r3 missing #1). This kernel replaces it: one invocation
processes R rows of a device's whole column block, laid out as S
sub-chunks of ``nl_c`` lanes on the SUBLANE axis (the staircase idea of
ops/pallas_longstair.py, scaled past 8):

    local step u: sublane s computes row base + u - s + 1 of sub-chunk s

Every vector op is (S, nl_c) — the Mosaic compile cliff is LANE count
(>1024 lanes -> 200-900 s compiles; CLAUDE.md), so growing S keeps the
op's lane width at <=1024 while one op covers up to S*nl_c = 96k
columns. Boundary records [max3(H), max(T1,T3), prefix-max] flow
sublane-to-sublane through an in-register roll with the delay-1 /
delay-2 schedule proven in pallas_longstair.py, and device-to-device as
an (R, 128) halo row block the caller ``lax.ppermute``s between
pipeline steps (SURVEY §5 long-context plan; the reference's intended
fast fill layer is partial.cpp:53-79 fillTablesParallel).

Each call ramps up and down internally (R + S - 1 steps), so its
``bnd_out`` carries complete records for rows base+1..base+R — the
contract the next device's next macro-step consumes. Per-call
utilization is R / (R + S - 1).

The DP math is the 2-carry (H, T3) formulation of
ops/pallas_fill.py:_rowscan2_kernel (value-exact vs the 3-table form
for h >= 0), with the T2 linearization seeded across sub-chunk and
device boundaries through the records (reference P2,
subproblem_alignment.cpp:237-325 generalised across a mesh).

Cross-call carries (state, rec_reg, rec_prev, fin) ride as operands ->
outputs so the caller's ``lax.scan`` owns them; chars do NOT need
carrying (sublane s first consumes at local step s, by which time the
step-0 fetch has rolled down to it).
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
    _neg,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A

REC_MP = 0   # record lane 0: max(T1,T2,T3) at the chunk's last column
REC_M13 = 1  # record lane 1: max(T1,T3) at the chunk's last column
REC_PM = 2   # record lane 2: prefix-max of omega through the chunk


def _lane_pm(x, w):
    s = 1
    while s < w:
        shifted = jnp.concatenate(
            [_neg(x.shape[:-1] + (s,)), x[..., :-s]], axis=-1)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _pf(win, col):
    """Shift lanes right by one, injecting ``col`` at lane 0."""
    return jnp.concatenate([col, win[:, :-1]], axis=-1)


def _last(x):
    """(S, 1) copy of each sublane's last lane (last-tile roll only)."""
    return pltpu.roll(x[:, x.shape[1] - 128:], shift=1, axis=1)[:, 0:1]


def _lane_at(row128, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, row128.shape, 1)
    return jnp.max(jnp.where(lane == k, row128, jnp.float32(NEG_INF)),
                   axis=-1, keepdims=True)


def _halostair_kernel(a_ref, b_ref, sc_ref, bnd_in_ref,
                      state_in, rec_in_ref, prev_in_ref, fin_in,
                      bnd_out_ref, state_out, rec_out_ref, prev_out_ref,
                      fin_out, char_reg,
                      *, S, nl_c, R, g, h, match, mismatch):
    """One macro-step: R rows of an S x nl_c column super-window.

    SMEM scalars (sc_ref): [cs, m_eff, start_type, base]. ``m_eff`` = 0
    marks an inactive pipeline step (ramp slots): every carry passes
    through untouched so the caller can run the scan unconditionally.
    """
    gf, hf = jnp.float32(g), jnp.float32(h)
    fmatch, fmis = jnp.float32(match), jnp.float32(mismatch)
    neg_inf = jnp.float32(NEG_INF)
    cs = sc_ref[0, 0]
    m = sc_ref[0, 1]
    stt = sc_ref[0, 2]
    base = sc_ref[0, 3]
    st_is12 = (stt == 1) | (stt == 2)

    sub = jax.lax.broadcasted_iota(jnp.int32, (S, nl_c), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, nl_c), 1)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    jj_g = cs + sub * nl_c + lane          # global column per cell
    jg = gf * jj_g.astype(jnp.float32)
    jgc = jg - gf - hf
    lane0 = jj_g == 0                      # device 0, sublane 0, lane 0

    # state/fin live in the output refs during the loop (outputs are
    # ordinary writable VMEM); seed them from the inputs
    state_out[...] = state_in[...]
    fin_out[...] = fin_in[...]
    rec_out_ref[...] = rec_in_ref[...]
    prev_out_ref[...] = prev_in_ref[...]
    char_reg[...] = jnp.full((S, 128), int(PAD_A), jnp.int32)

    def step(u, _):
        r_col = base + u - sub1[:, 0:1] + 1      # (S, 1) current row
        live = (u - sub1[:, 0:1] >= 0) & (u - sub1[:, 0:1] <= R - 1) \
            & (r_col <= m)
        live_nc = (u - sub[:, 0:1] >= 0) & (u - sub[:, 0:1] <= R - 1) \
            & (base + u - sub[:, 0:1] + 1 <= m)

        # records: sublane s takes sublane s-1's previous emission;
        # sublane 0 reads the halo (rows base+1..base+R; clamped during
        # ramp-down, consumed only while live)
        shifted = pltpu.roll(rec_out_ref[...], shift=1, axis=0)
        slot = jnp.clip(u, 0, R - 1)
        hbm_row = bnd_in_ref[pl.ds(slot, 1), :]
        rec_in = jnp.where(sub1 == 0,
                           jnp.broadcast_to(hbm_row, (S, 128)), shifted)

        # chars: fetched by sublane 0 (window index 128 + u; the caller
        # slices a 128-padded window at ``base``), rolled down one
        # sublane per step — arrives at sublane s exactly at step s
        newch = _char_col(a_ref, 128 + u)        # (1, 1)
        chars = jnp.where(sub1 == 0,
                          jnp.broadcast_to(newch, (S, 128)),
                          pltpu.roll(char_reg[...], shift=1, axis=0))
        char_reg[...] = chars
        a_col = chars[:, 0:1]

        hp = state_out[0]
        t3p = state_out[1]
        fb = jnp.where(b_ref[...] == a_col, fmatch, fmis)
        mp_in = _lane_at(prev_out_ref[...], REC_MP)
        t1 = fb + _pf(hp, mp_in)
        t3 = jnp.maximum(hp - gf - hf, t3p - gf)
        rf = r_col.astype(jnp.float32)
        col0_3 = jnp.where(stt == -3, -gf * rf,
                           jnp.where(st_is12, neg_inf, -hf - gf * rf))
        t3 = jnp.where(lane0, jnp.broadcast_to(col0_3, t3.shape), t3)
        m13u = jnp.maximum(t1, t3)
        m13_in = _lane_at(rec_in, REC_M13)
        pm_in = _lane_at(rec_in, REC_PM)
        omega = jgc + _pf(m13u, m13_in)
        pm = jnp.maximum(_lane_pm(omega, nl_c), pm_in)
        t2 = pm - jg
        hn = jnp.maximum(m13u, t2)

        state_out[0] = jnp.where(live_nc, hn, hp)
        state_out[1] = jnp.where(live_nc, t3, t3p)

        cap = live_nc & (base + u - sub[:, 0:1] + 1 == m)
        fin_out[0] = jnp.where(cap, t1, fin_out[0])
        fin_out[1] = jnp.where(cap, t2, fin_out[1])
        fin_out[2] = jnp.where(cap, t3, fin_out[2])

        # emit this row's record (passthrough when frozen)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        em = jnp.where(lane1 == REC_MP,
                       jnp.broadcast_to(_last(hn), (S, 128)), neg_inf)
        em = jnp.where(lane1 == REC_M13,
                       jnp.broadcast_to(_last(m13u), (S, 128)), em)
        em = jnp.where(lane1 == REC_PM,
                       jnp.broadcast_to(_last(pm), (S, 128)), em)
        em = jnp.where(live, em, rec_out_ref[...])
        prev_out_ref[...] = rec_in
        rec_out_ref[...] = em
        out_slot = jnp.clip(u - (S - 1), 0, R - 1)
        bnd_out_ref[pl.ds(out_slot, 1), :] = em[S - 1: S, :]
        return 0

    @pl.when(m > 0)
    def _():
        # Mosaic fori_loop supports only unroll=1 or full unroll
        jax.lax.fori_loop(0, R + S - 1, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("S", "nl_c", "R", "g", "h", "match", "mismatch",
                     "interpret"))
def halostair_step(a_win, b_sub, sc, bnd_in, state, rec_reg, rec_prev,
                   fin, *, S, nl_c, R, g, h, match, mismatch,
                   interpret=False):
    """One pipeline macro-step (R rows) on one device's column block.

    a_win: (1, R + 256) int32 char window starting at padded index
    ``base`` (the caller pads A with 128 leading PAD_A chars so
    window index 128 + u is char base + u). Returns
    (bnd_out, state, rec_reg, rec_prev, fin).
    """
    kernel = functools.partial(
        _halostair_kernel, S=S, nl_c=nl_c, R=R, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch))
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(a_win.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, nl_c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, S, nl_c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, S, nl_c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, S, nl_c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, S, nl_c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, S, nl_c), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, S, nl_c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.int32)],
        interpret=interpret,
    )(a_win, b_sub, sc, bnd_in, state, rec_reg, rec_prev, fin)


def halostair_init(k_idx, S, nl_c, g, h, start_type):
    """Initial scan carries for one device (XLA closed forms).

    k_idx: traced device index along the ``seq`` axis. Returns
    (state0 (2,S,nl_c), rec_reg0 (S,128), rec_prev0 (S,128),
    fin0 (3,S,nl_c)) for DP row 0 of global columns
    [k_idx*S*nl_c, (k_idx+1)*S*nl_c).
    """
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    cs = k_idx * (S * nl_c)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, nl_c), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, nl_c), 1)
    jj_g = cs + sub * nl_c + lane
    jf = jj_g.astype(jnp.float32)
    lane0 = jj_g == 0

    if start_type == -2:
        row0_t2 = -gf * jf
    elif start_type in (1, 3):
        row0_t2 = jnp.full((S, nl_c), neg_inf)
    else:
        row0_t2 = -hf - gf * jf
    corner1 = 0.0 if start_type in (1, -1) else NEG_INF
    corner2 = 0.0 if start_type == -2 else NEG_INF
    corner3 = 0.0 if start_type == -3 else NEG_INF
    r1 = jnp.where(lane0, jnp.float32(corner1), neg_inf)
    r2 = jnp.where(lane0, jnp.float32(corner2), row0_t2)
    r3 = jnp.where(lane0, jnp.float32(corner3), neg_inf)
    h0 = jnp.maximum(jnp.maximum(r1, r2), r3)
    state0 = jnp.stack([h0, r3])

    # per-sub-chunk row-0 record at the chunk's LAST column: max3 is the
    # T2 closed form there (T1/T3 are -inf off column 0); m13/pm unread
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    j_last = (cs + (sub1 + 1) * nl_c - 1).astype(jnp.float32)

    def t2_closed(jv):
        if start_type == -2:
            return -gf * jv
        if start_type in (1, 3):
            return jnp.full_like(jv, neg_inf)
        return -hf - gf * jv

    rec_reg0 = jnp.where(lane1 == REC_MP, t2_closed(j_last), neg_inf)
    # rec_prev: only sublane 0's REC_MP slot is ever consumed before
    # being overwritten — the row-0 record at global column cs - 1
    # (device 0: -inf; there is no column left of 0)
    ghost = jnp.where(k_idx == 0, neg_inf,
                      t2_closed((cs - 1).astype(jnp.float32)))
    rec_prev0 = jnp.where((sub1 == 0) & (lane1 == REC_MP), ghost,
                          jnp.full((S, 128), neg_inf))
    fin0 = jnp.full((3, S, nl_c), neg_inf)
    # row 0 IS the final row when m == 0 — callers handle m == 0 on the
    # host (closed form), so fin0 stays -inf here
    return state0, rec_reg0, rec_prev0, fin0


def pick_geometry(nc, max_S=96):
    """(S, nl_c) covering ``nc`` columns: lane width <= 1024 (the Mosaic
    compile cliff), S a multiple of 8 (sublane tile), minimizing padded
    area then ramp length."""
    best = None
    best_key = None
    for nl_c in (256, 512, 1024):
        S = -(-nc // nl_c)
        S = -(-S // 8) * 8
        if S > max_S:
            continue
        key = (S * nl_c, S)  # padded area first, then ramp length
        if best_key is None or key < best_key:
            best, best_key = (S, nl_c), key
    if best is None:
        # fall back to the widest geometry; caller must super-chunk
        return max_S, 1024
    return best
