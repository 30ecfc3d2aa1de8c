"""Column-blocked row-sweep Pallas kernel: score + dirs + run-length
dirs in ONE program family whose every vector op is <= 1024 lanes.

Why this exists (measured on the evaluation v5e, round 3): Mosaic
compile time falls off a cliff when kernel ops exceed 8 f32 vregs —
the same row-sweep body compiles in ~2.5 s at 1024 lanes and in
380-900 s at 1152+ lanes, and compiled programs do NOT survive process
restarts here (the loopback compile service re-compiles everything).
The whole-row kernels (ops/pallas_fill.py rowscan/rowdirs) are
therefore unusable past 1 kb buckets in fresh processes; this kernel
processes each DP row in <=1024-lane column blocks carried by
(block_b, 1) boundary registers — the in-register version of the
longrow kernel's HBM boundary records (ops/pallas_longrow.py) — so the
compiled program stays under the cliff at any bucket width that fits
VMEM (~16 kb columns).

Semantics are identical to _rowdirs_kernel / _rowscan_kernel
(tests assert cell- and byte-equality): same Gotoh recurrences, same
T2 prefix-max linearization (reference P2, subproblem_alignment.cpp:
237-325), same direction tie orders (B3), same with_runs uint16
encoding for the run-length device walk, and dynamic per-pair boundary
types.
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
    _lane_prefix_max_perm,
    _neg,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

# ops wider than 8 f32 vregs (1024 lanes) trip the compile cliff
CB = 1024


def _blocks(nl):
    out, s = [], 0
    while s < nl:
        w = min(CB, nl - s)
        out.append((s, w))
        s += w
    return out


def _lane_pm(x, w):
    """Inclusive prefix max over <= CB lanes (log-shift sweeps)."""
    s = 1
    while s < w:
        shifted = jnp.concatenate(
            [_neg(x.shape[:-1] + (s,)), x[..., :-s]], axis=-1)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _pf(win, col):
    """Lane shift right by one, injecting ``col`` at lane 0."""
    return jnp.concatenate([col, win[:, :-1]], axis=-1)


def _pf_perm(win, col, w):
    """Column shift right by one in the within-block permuted layout
    (local column jl at flat position (jl % tn)*128 + jl // tn),
    injecting ``col`` at local column 0. One 128-aligned wide concat +
    one narrow op instead of an unaligned full-width lane shift (the
    expensive Mosaic op class — attrib2_r5)."""
    tn = w // 128
    last = win[:, (tn - 1) * 128:]
    fix0 = jnp.concatenate([col.astype(win.dtype), last[:, :-1]],
                           axis=-1)
    return jnp.concatenate([fix0, win[:, : (tn - 1) * 128]], axis=-1)


def _perm_cols_cb(x, nl, ncols=None):
    """Host-side within-block column permutation for the rowcb layout:
    flat position q of block (s, w) holds column s + (q%128)*tn + q//128
    (tn = w/128). ``ncols``: permute only the first ncols columns (the
    k1 profile repeats the pattern per plane)."""
    x = np.asarray(x)
    out = x.copy()
    base = 0
    total = x.shape[-1] if ncols is None else ncols
    while base < x.shape[-1]:
        for (s, w) in _blocks(total):
            tn = w // 128
            if tn <= 1:
                continue
            q = np.arange(w)
            j_of_q = (q % 128) * tn + q // 128
            out[..., base + s: base + s + w] = \
                x[..., base + s + j_of_q]
        base += total
    return out


def _last(x):
    """(block_b, 1) copy of x's last lane.

    Rolls only the final 128-lane tile (the slice start is a 128
    multiple because column blocks are): a full-width roll is a whole
    VPU pass, and the boundary registers need ~7 extractions per block
    per row — measured 3x on the fill rate before this narrowing."""
    return pltpu.roll(x[:, x.shape[1] - 128:], shift=1, axis=1)[:, 0:1]


def _rowcb_kernel(a_ref, bext_ref, lbmask_ref, la_ref, st_ref,
                  dirs_ref, fin_ref, state, fin_acc, run_state,
                  *, m, n, nl, g, h, match, mismatch, k_steps, num_rows,
                  want_dirs, with_runs, k1=0, perm=False, runs2=False):
    """``k1 == 0``: match/mismatch scoring against ``bext_ref`` column
    codes. ``k1 > 0``: substitution-matrix mode — ``bext_ref`` is the
    pre-gathered query profile (block_b, k1*nl) with
    prof[:, k*nl + j] = table[k, B[j]] and ``a_ref`` holds alphabet
    codes; f(A[i], B[j]) resolves with k1-1 lane selects (Mosaic has no
    vector gather). Generalizes the reference's f()
    (subproblem_alignment.h:83-88) through the SAME dirs16+runs fused
    path the DNA engine uses."""
    block_b = bext_ref.shape[0]
    dblk = pl.program_id(1)
    gf, hf = jnp.float32(g), jnp.float32(h)
    neg_inf = jnp.float32(NEG_INF)
    la_col = la_ref[:, 0:1]
    stc = st_ref[:, 0:1]
    st_is2 = stc == -2
    st_is13 = (stc == 1) | (stc == 3)
    st_is12 = (stc == 1) | (stc == 2)
    negc = jnp.full((block_b, 1), neg_inf)
    zeroc = jnp.zeros((block_b, 1), jnp.int32)
    blocks = _blocks(nl)
    out_dtype = jnp.uint16 if with_runs else jnp.uint8

    def jg_of(s, w):
        p = jax.lax.broadcasted_iota(jnp.int32, (block_b, w), 1)
        if perm and w > 128:
            tn = w // 128
            jjb = (p % 128) * tn + p // 128 + s
        else:
            jjb = p + s
        return jjb, gf * jjb.astype(jnp.float32)

    def pf_of(w):
        if perm and w > 128:
            return lambda win, col: _pf_perm(win, col, w)
        return _pf

    def lpm_of(w):
        if perm and w > 128:
            return lambda x: _lane_prefix_max_perm(x, w)
        return lambda x: _lane_pm(x, w)

    @pl.when(dblk == 0)
    def _():
        for (s, w) in blocks:
            sl = pl.ds(s, w)
            jjb, jg = jg_of(s, w)
            lane0 = jjb == 0
            corner1 = jnp.where((stc == 1) | (stc == -1), 0.0, neg_inf)
            corner2 = jnp.where(stc == -2, 0.0, neg_inf)
            corner3 = jnp.where(stc == -3, 0.0, neg_inf)
            row0_t2 = jnp.where(st_is2, -jg,
                                jnp.where(st_is13, neg_inf, -hf - jg))
            r1 = jnp.where(lane0, corner1, neg_inf)
            r2 = jnp.where(lane0, corner2, row0_t2)
            r3 = jnp.where(lane0, corner3, neg_inf)
            state[0, :, sl] = r1
            state[1, :, sl] = r2
            state[2, :, sl] = r3
            cap = (la_col == 0) & (lbmask_ref[:, sl] != 0)
            fin_acc[0, :, sl] = jnp.where(cap, r1, neg_inf)
            fin_acc[1, :, sl] = jnp.where(cap, r2, neg_inf)
            fin_acc[2, :, sl] = jnp.where(cap, r3, neg_inf)
            if with_runs:
                run_state[0, :, sl] = jnp.zeros((block_b, w), jnp.int32)
                run_state[1, :, sl] = jnp.zeros((block_b, w), jnp.int32)
                if runs2:
                    run_state[2, :, sl] = jnp.zeros((block_b, w),
                                                    jnp.int32)
                    run_state[3, :, sl] = jnp.zeros((block_b, w),
                                                    jnp.int32)

    def argmax3(c1, c2, c3):
        return jnp.where((c1 >= c2) & (c1 >= c3), 0,
                         jnp.where(c2 >= c3, 1, 2))

    for u in range(k_steps):
        i = dblk * k_steps + u

        @pl.when((i == 0) | (i >= num_rows))
        def _(u=u):
            if want_dirs:
                for (s, w) in blocks:
                    dirs_ref[u, :, pl.ds(s, w)] = jnp.zeros(
                        (block_b, w), jnp.int32).astype(out_dtype)

        @pl.when((i > 0) & (i < num_rows))
        def _(i=i, u=u):
            a_col = _char_col(a_ref, i - 1)
            i_f = jnp.float32(1.0) * i
            col0_3 = jnp.where(stc == -3, -gf * i_f,
                               jnp.where(st_is12, neg_inf,
                                         -hf - gf * i_f))
            # cross-block boundary registers ((block_b, 1) each): the
            # in-register form of the longrow kernel's bnd records
            mp_in = negc       # prev-row max3 at j-1 of block edge
            m13_in = negc      # current-row max(T1,T3) at block edge
            pm_in = negc       # running omega prefix-max
            d1_in = zeroc      # prev-row argmax3 at block edge
            d2_in = zeroc      # current-row d2 argmax at block edge
            r_in = zeroc       # prev-row run length at block edge
            ca_in = zeroc      # prev-row after-run code at block edge
            c2_in = zeroc      # prev-row landing code at block edge
            pd_in = zeroc      # prev-row packed d2|d3 at block edge
            for bi, (s, w) in enumerate(blocks):
                sl = pl.ds(s, w)
                jjb, jg = jg_of(s, w)
                pf = pf_of(w)
                lpm = lpm_of(w)
                lane0 = jjb == 0
                p1 = state[0, :, sl]
                p2 = state[1, :, sl]
                p3 = state[2, :, sl]
                mp12 = jnp.maximum(p1, p2)
                mp3 = jnp.maximum(mp12, p3)
                if k1:
                    fb = bext_ref[:, pl.ds(s, w)]
                    for kk in range(1, k1):
                        fb = jnp.where(
                            a_col == kk,
                            bext_ref[:, pl.ds(kk * nl + s, w)], fb)
                else:
                    fb = jnp.where(bext_ref[:, sl] == a_col,
                                   jnp.float32(match),
                                   jnp.float32(mismatch))
                t1 = fb + pf(mp3, mp_in)
                t3 = jnp.maximum(mp12 - gf - hf, p3 - gf)
                if bi == 0:
                    t1 = jnp.where(lane0, neg_inf, t1)
                    t3 = jnp.where(lane0, col0_3, t3)
                m13 = jnp.maximum(t1, t3)
                omega = jg + pf(m13, m13_in) - gf - hf
                if bi == 0:
                    omega = jnp.where(lane0, neg_inf, omega)
                pm = jnp.maximum(lpm(omega), pm_in)
                t2 = pm - jg
                if bi == 0:
                    t2 = jnp.where(lane0, neg_inf, t2)
                mp_in = _last(mp3)
                m13_in = _last(m13)
                pm_in = _last(pm)

                if want_dirs:
                    am3 = argmax3(p1, p2, p3)
                    d1 = pf(am3, d1_in)
                    d1_in = _last(am3)
                    d3 = argmax3(p1, p2, p3 + hf)
                    d2b = argmax3(t1 - hf, t2, t3 - hf)
                    d2 = pf(d2b, d2_in)
                    d2_in = _last(d2b)
                    packed = (d1 << DIR_T1_SHIFT) | (d2 << DIR_T2_SHIFT) \
                        | (d3 << DIR_T3_SHIFT)
                    if with_runs:
                        pr = run_state[0, :, sl]
                        pca = run_state[1, :, sl]
                        r_prev = pf(pr, r_in)
                        ca_prev = pf(pca, ca_in)
                        r_in = _last(pr)
                        ca_in = _last(pca)
                        is_run = d1 == 0
                        rcap = 63 if runs2 else 255
                        capped = r_prev >= rcap
                        r_cur = jnp.where(
                            is_run, jnp.minimum(r_prev + 1, rcap), 0)
                        ca_cur = jnp.where(
                            is_run, jnp.where(capped, 0, ca_prev), d1)
                        run_state[0, :, sl] = r_cur
                        run_state[1, :, sl] = ca_cur
                        packed = packed | (ca_cur << 6) | (r_cur << 8)
                        if runs2:
                            # c2 = the run's LANDING-cell code for table
                            # ca+1 (the packed d2/d3 of the previous
                            # row's diagonal neighbor), propagated down
                            # the run like ca — lets the walk consume
                            # run + first gap step in ONE gather round
                            pc2 = run_state[2, :, sl]
                            pd23 = run_state[3, :, sl]
                            c2_prev = pf(pc2, c2_in)
                            d23_sh = pf(pd23, pd_in)
                            c2_in = _last(pc2)
                            pd_in = _last(pd23)
                            c2_new = jnp.where(d1 == 1, d23_sh & 3,
                                               (d23_sh >> 2) & 3)
                            c2_cur = jnp.where(
                                is_run,
                                jnp.where(capped, 0, c2_prev), c2_new)
                            run_state[2, :, sl] = c2_cur
                            run_state[3, :, sl] = d2 | (d3 << 2)
                            packed = packed | (c2_cur << 14)
                    dirs_ref[u, :, sl] = packed.astype(out_dtype)

                cap = (la_col == i) & (lbmask_ref[:, sl] != 0)
                fin_acc[0, :, sl] = jnp.where(cap, t1, fin_acc[0, :, sl])
                fin_acc[1, :, sl] = jnp.where(cap, t2, fin_acc[1, :, sl])
                fin_acc[2, :, sl] = jnp.where(cap, t3, fin_acc[2, :, sl])
                state[0, :, sl] = t1
                state[1, :, sl] = t2
                state[2, :, sl] = t3

        @pl.when(i == num_rows - 1)
        def _():
            # per-block partial maxes keep the reduce under the cliff
            finals = []
            for k in range(3):
                acc = negc
                for (s, w) in blocks:
                    acc = jnp.maximum(acc, jnp.max(
                        fin_acc[k, :, pl.ds(s, w)], axis=-1,
                        keepdims=True))
                finals.append(acc)
            fin_ref[...] = _emit_row(finals)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "g", "h", "match", "mismatch",
                     "block_b", "interpret", "k_steps", "want_dirs",
                     "with_runs", "k1", "perm", "runs2"))
def _pallas_rowcb(a_pad, b_ext, lbmask, la, st, *, m, n, nl, g, h,
                  match, mismatch, block_b, interpret, k_steps=8,
                  want_dirs=True, with_runs=True, k1=0, perm=False,
                  runs2=False):
    B = a_pad.shape[0]
    num_rows = m + 1
    num_blk = -(-num_rows // k_steps)
    grid = (B // block_b, num_blk)
    # sequences may arrive uint8 (4x cheaper host->device through the
    # evaluation tunnel) and the lb mask as a (B, 128) length plane;
    # widen / expand ON DEVICE (Mosaic needs 32-bit vector inputs)
    if a_pad.dtype != jnp.int32:
        a_pad = a_pad.astype(jnp.int32)
    if jnp.issubdtype(b_ext.dtype, jnp.integer) and b_ext.dtype != jnp.int32:
        # widen only integer inputs (uint8 column codes / integer query
        # profiles); a float32 substitution-matrix profile (k1 > 0) must
        # NOT be truncated toward zero — fractional matrices are legal
        # and already meet Mosaic's 32-bit vector requirement.
        b_ext = b_ext.astype(jnp.int32)
    if lbmask.shape[1] != nl:  # (B, 128) len_b plane (nl == 128 buckets
        # ship the real mask, so width disambiguates)
        if perm:
            # column held at flat position p of block (s, w)
            p = jnp.arange(nl, dtype=jnp.int32)
            jcol = jnp.empty_like(p)
            for (s, w) in _blocks(nl):
                q = p[s: s + w] - s
                tn = w // 128
                jl = (q % 128) * tn + q // 128 if tn > 1 else q
                jcol = jcol.at[s: s + w].set(s + jl)
            lbmask = (jcol[None, :] == lbmask[:, 0:1]).astype(jnp.int32)
        else:
            jj = jnp.arange(nl, dtype=jnp.int32)[None, :]
            lbmask = (jj == lbmask[:, 0:1]).astype(jnp.int32)
    kernel = functools.partial(
        _rowcb_kernel, m=m, n=n, nl=nl, g=float(g), h=float(h),
        match=float(match), mismatch=float(mismatch), k_steps=k_steps,
        num_rows=num_rows, want_dirs=want_dirs, with_runs=with_runs,
        k1=k1, perm=perm, runs2=runs2)
    dirs_shape = (num_blk * k_steps if want_dirs else k_steps, B, nl)
    bw = k1 * nl if k1 else nl  # query profile vs column codes
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, a_pad.shape[1]), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, bw), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, nl), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (k_steps, block_b, nl),
                (lambda b, d: (d, b, 0)) if want_dirs else
                (lambda b, d: (0, b, 0)),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                dirs_shape, jnp.uint16 if with_runs else jnp.uint8),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, block_b, nl), jnp.float32),
            pltpu.VMEM((3, block_b, nl), jnp.float32),
            pltpu.VMEM((4 if runs2 else 2, block_b, nl), jnp.int32),
        ],
        interpret=interpret,
    )(a_pad, b_ext, lbmask, la, st)


def rowcb_prep(a_enc, b_enc, len_a, len_b, start_type=-1,
               block_b=DEF_BLOCK_B, carries=19, perm=False):
    """Host-side packing (rowscan_prep with the per-pair type plane).

    Sequences stay uint8 and the lb mask ships as a (Bp, 128) length
    plane — 4x fewer host->device bytes through the evaluation tunnel;
    _pallas_rowcb widens and expands on device. ``perm``: within-block
    permuted column layout (pair with the kernel's perm=True)."""
    a_enc = np.asarray(a_enc, np.uint8)
    b_enc = np.asarray(b_enc, np.uint8)
    B, m = a_enc.shape
    n = b_enc.shape[1]
    nl = -(-(n + 1) // 128) * 128
    ma = max(-(-m // 128) * 128, 128) + 128
    block_b = _fit_block_b(block_b, 2 * (ma + 2 * nl + 256) + carries * nl)
    Bp = -(-B // block_b) * block_b
    a_pad = np.full((Bp, ma), int(PAD_A), np.uint8)
    a_pad[:B, :m] = a_enc
    b_ext = np.full((Bp, nl), int(PAD_B), np.uint8)
    b_ext[:B, 1: n + 1] = b_enc
    perm = bool(perm) and nl > 128
    if perm:
        b_ext = _perm_cols_cb(b_ext, nl)
    if nl == 128:  # width would be ambiguous with the length plane
        lbq = np.zeros((Bp, nl), np.int32)
        lbq[np.arange(B), np.asarray(len_b, np.int64)] = 1
    else:
        lbq = np.full((Bp, 128), -1, np.int32)
        lbq[:B] = np.asarray(len_b, np.int32)[:, None]
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    st = np.full((Bp, 128), int(start_type), np.int32)
    meta = dict(m=m, n=n, nl=nl, block_b=block_b, perm=perm)
    return (a_pad, b_ext, lbq, la, st), meta


def rowcb_mat_prep(a_codes, b_codes, len_a, len_b, table, start_type=-1,
                   block_b=DEF_BLOCK_B, carries=19, perm=False):
    """Host packing for matrix mode: ((a_pad codes, prof, lbmask, la,
    st), meta). prof[:, k*nl + j] = table[k, b_ext[j]] (the query-
    profile pre-gather of pallas_fill._submat_kernel, with the rowcb
    per-pair type plane). VMEM-fits block_b against the k1 profile
    planes, so protein-scale alphabets trade batch width for lanes."""
    a_codes = np.asarray(a_codes, np.uint8)
    b_codes = np.asarray(b_codes, np.uint8)
    table = np.asarray(table, np.float32)
    k1 = table.shape[0]
    B, m = a_codes.shape
    n = b_codes.shape[1]
    nl = -(-(n + 1) // 128) * 128
    ma = max(-(-m // 128) * 128, 128) + 128
    block_b = _fit_block_b(
        block_b, 2 * (ma + (k1 + 1) * nl + 256) + carries * nl)
    Bp = -(-B // block_b) * block_b
    a_pad = np.full((Bp, ma), k1 - 1, np.int32)
    a_pad[:B, :m] = a_codes
    b_ext = np.full((Bp, nl), k1 - 1, np.int64)
    b_ext[:B, 1: n + 1] = b_codes
    prof = np.ascontiguousarray(
        table[:, b_ext].transpose(1, 0, 2).reshape(Bp, k1 * nl))
    lbmask = np.zeros((Bp, nl), np.int32)
    lbmask[np.arange(B), np.asarray(len_b, np.int64)] = 1
    perm = bool(perm) and nl > 128
    if perm:
        prof = _perm_cols_cb(prof, nl, ncols=nl)  # per k1 plane
        lbmask = _perm_cols_cb(lbmask, nl)
    la = np.full((Bp, 128), -1, np.int32)
    la[:B] = np.asarray(len_a, np.int32)[:, None]
    st = np.full((Bp, 128), int(start_type), np.int32)
    meta = dict(m=m, n=n, nl=nl, block_b=block_b, k1=k1, perm=perm)
    return (a_pad, prof, lbmask, la, st), meta


def pallas_rowcb_mat_dirs_batch(a_codes, b_codes, len_a, len_b, table,
                                g=1.0, h=2.0, start_type=-1,
                                block_b=DEF_BLOCK_B, device_dirs=False,
                                with_runs=False, interpret=None):
    """Substitution-matrix dirs fill through the rowcb kernel (row
    layout; uint16 runs when ``with_runs``). Returns (finals, dirs)."""
    B = np.asarray(a_codes).shape[0]
    args, meta = rowcb_mat_prep(a_codes, b_codes, len_a, len_b, table,
                                start_type, block_b)
    dirs, fin = _pallas_rowcb(
        *args, g=g, h=h, match=0.0, mismatch=0.0,
        interpret=_default_interpret(interpret), want_dirs=True,
        with_runs=with_runs, **meta)
    if device_dirs:
        return np.asarray(fin)[:B, :3], dirs
    return np.asarray(fin)[:B, :3], np.asarray(dirs)[:, :B, :]


def pallas_rowcb_score_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                             match=1.0, mismatch=0.0, start_type=-1,
                             block_b=DEF_BLOCK_B, interpret=None):
    """Batched score-only fill. Returns (B, 3) finals."""
    B = np.asarray(a_enc).shape[0]
    args, meta = rowcb_prep(a_enc, b_enc, len_a, len_b, start_type,
                            block_b, carries=13)
    _, fin = _pallas_rowcb(
        *args, g=g, h=h, match=match, mismatch=mismatch,
        interpret=_default_interpret(interpret), want_dirs=False,
        with_runs=False, **meta)
    return np.asarray(fin)[:B, :3]


def pallas_rowcb_dirs_batch(a_enc, b_enc, len_a, len_b, g=1.0, h=2.0,
                            match=1.0, mismatch=0.0, start_type=-1,
                            block_b=DEF_BLOCK_B, device_dirs=False,
                            with_runs=False, interpret=None):
    """Batched dirs fill (row layout; uint16 runs when ``with_runs``)."""
    B = np.asarray(a_enc).shape[0]
    args, meta = rowcb_prep(a_enc, b_enc, len_a, len_b, start_type,
                            block_b)
    dirs, fin = _pallas_rowcb(
        *args, g=g, h=h, match=match, mismatch=mismatch,
        interpret=_default_interpret(interpret), want_dirs=True,
        with_runs=with_runs, **meta)
    if device_dirs:
        return np.asarray(fin)[:B, :3], dirs
    return np.asarray(fin)[:B, :3], np.asarray(dirs)[:, :B, :]
