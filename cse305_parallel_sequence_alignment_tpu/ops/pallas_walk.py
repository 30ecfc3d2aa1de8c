"""Pallas TPU traceback walk: interleaved per-pair scalar walks with
tile DMAs.

Why (round-4 framing; round 5 re-measured the XLA walk at ~7 ms per
128 x 2 kb chunk and ~5 ms device-time, so it is no longer the e2e
ceiling — this kernel stays as the documented experimental
alternative): the XLA while-loop walk (ops/device_walk.py
_walk_core_rle) was measured at ~0.24 ms PER RLE ROUND at batch 128 —
the B-element gather from the HBM-resident dirs array lowers to
mostly-serial small DMAs — so a ~98-round walk (random-DNA 2 kb pairs
average ~21-step diagonal runs) cost ~23 ms in round 4
(scripts/probes/walk_isolate_r4.py; much of that was the evaluation
tunnel's per-dispatch overhead). Here the walk runs as a Pallas kernel:
the grid covers groups of G pairs, each grid step walks its G pairs
INTERLEAVED — G dependent DMA chains in flight, so the ~1-3 us HBM
round-trip per RLE round amortizes G-fold. Semantics are copied from
_walk_core_rle (same entry stream bit-for-bit; tests assert so).

Mosaic constraints shape the memory traffic:
- HBM slices must align to the (8, 128) tiling of the trailing two
  dims, so each fetch pulls the aligned (1, 8, W) tile containing the
  wanted element STRAIGHT INTO SMEM, where the scalar core reads it
  (a VMEM landing + masked-reduce hop raced the scalar core against
  the VPU on hardware);
- the dirs array enters bitcast to int32 pairs (SMEM scalars are
  32-bit);
- each pair's entry row leaves through a (1, R_pad) SMEM->HBM copy
  into a (B, 1, R_pad) output (leading dims slice at granularity 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _walk_group_kernel(ij_ref, dirs_ref, ent_ref, used_ref,
                       tile_smem, ent_smem, sems, out_sem,
                       *, G, R_pad, nrows, ncols):
    """Walk G pairs (grid step g covers pairs g*G..g*G+G-1),
    interleaving their dependent DMA chains. ij_ref: (3, B) SMEM.
    dirs_ref: (nrows, B, ncols//2) int32 HBM. ent_ref: (B, 1, R_pad)
    int32 HBM. used_ref: (1, B) SMEM. tile_smem: (G, 8, W) SMEM.
    ent_smem: (G, 1, R_pad) SMEM."""
    g0 = pl.program_id(0) * G
    W = min(128, ncols // 2)

    def start_fetch(u, i, j):
        b = g0 + u
        r = jnp.clip(i, 0, nrows - 1)
        c2 = jnp.clip(j, 0, ncols - 1) // 2
        cW = (c2 // W) * W
        b8 = (b // 8) * 8
        dma = pltpu.make_async_copy(
            dirs_ref.at[pl.ds(r, 1), pl.ds(pl.multiple_of(b8, 8), 8),
                        pl.ds(pl.multiple_of(cW, W), W)],
            tile_smem.at[pl.ds(u, 1)], sems.at[u])
        dma.start()
        return dma

    # state as G-tuples of scalars carried through one while loop; a
    # finished pair keeps issuing (clipped, harmless) fetches until the
    # whole group is done — its rd stays frozen
    def cond(state):
        alive = state[3]
        return sum(alive) > 0

    def body(state):
        iv, jv, tv, alive, rd = state
        iv2, jv2, tv2, alive2, rd2 = [], [], [], [], []
        for u in range(G):
            # wait this pair's tile (started by init or previous round)
            pltpu.make_async_copy(
                dirs_ref.at[pl.ds(0, 1), pl.ds(0, 8), pl.ds(0, W)],
                tile_smem.at[pl.ds(u, 1)], sems.at[u]).wait()
            b = g0 + u
            brem = b - (b // 8) * 8
            c = jnp.clip(jv[u], 0, ncols - 1)
            c2 = c // 2
            word32 = tile_smem[u, brem, c2 - (c2 // W) * W]
            word = (word32 >> (16 * (c % 2))) & 0xFFFF
            t = tv[u]
            shift = jnp.where(t == 2, 2, jnp.where(t == 3, 4, 0))
            c_now = (word >> shift) & 3
            is_run = t == 1
            k = jnp.where(is_run, (word >> 8) & 255, 0)
            op = jnp.where(is_run, (word >> 6) & 3, c_now)
            di = jnp.where(is_run, k + 1, jnp.where(t == 3, 1, 0))
            dj = jnp.where(is_run, k + 1, jnp.where(t == 2, 1, 0))
            act = alive[u]
            ent_smem[u, 0, jnp.clip(rd[u], 0, R_pad - 1)] = jnp.where(
                act > 0, (op + 1) | (k << 2),
                ent_smem[u, 0, jnp.clip(rd[u], 0, R_pad - 1)])
            i2 = jnp.where(act > 0, iv[u] - di, iv[u])
            j2 = jnp.where(act > 0, jv[u] - dj, jv[u])
            t2 = jnp.where(act > 0, op + 1, t)
            r2 = jnp.where(act > 0, rd[u] + 1, rd[u])
            a2 = jnp.where((i2 > 0) & (j2 > 0) & (r2 < R_pad),
                           act, jnp.int32(0))
            start_fetch(u, i2, j2)
            iv2.append(i2)
            jv2.append(j2)
            tv2.append(t2)
            alive2.append(a2)
            rd2.append(r2)
        return (tuple(iv2), tuple(jv2), tuple(tv2), tuple(alive2),
                tuple(rd2))

    iv0, jv0, tv0, alive0 = [], [], [], []
    for u in range(G):
        b = g0 + u
        i0 = ij_ref[0, b]
        j0 = ij_ref[1, b]
        iv0.append(i0)
        jv0.append(j0)
        tv0.append(ij_ref[2, b])
        alive0.append(jnp.where((i0 > 0) & (j0 > 0), jnp.int32(1),
                                jnp.int32(0)))
        start_fetch(u, i0, j0)
    state = jax.lax.while_loop(
        cond, body,
        (tuple(iv0), tuple(jv0), tuple(tv0), tuple(alive0),
         tuple(jnp.int32(0) for _ in range(G))))
    rd_fin = state[4]
    for u in range(G):
        # drain the last in-flight fetch so the kernel exits clean
        pltpu.make_async_copy(
            dirs_ref.at[pl.ds(0, 1), pl.ds(0, 8), pl.ds(0, W)],
            tile_smem.at[pl.ds(u, 1)], sems.at[u]).wait()
        b = g0 + u
        used_ref[0, b] = rd_fin[u]
        # terminator for the host replay (op == 0 ends the stream)
        ent_smem[u, 0, jnp.clip(rd_fin[u], 0, R_pad - 1)] = 0
        out = pltpu.make_async_copy(
            ent_smem.at[u], ent_ref.at[b], out_sem)
        out.start()
        out.wait()


@functools.partial(
    jax.jit, static_argnames=("R_pad", "G", "interpret"))
def pallas_walk_rle(dirs16, i0, j0, t0, *, R_pad, G=8, interpret=False):
    """RLE walk of a (nrows, B, nl) uint16 dirs array on-device.

    Returns (entries (B, R_pad') int32 — low 10 bits are the uint16
    entry stream of ops/device_walk.py _walk_core_rle — and
    used (B,) int32 rounds per pair). R_pad rounds up to 128; B must
    divide by G (callers pad)."""
    nrows, B, nl = dirs16.shape
    R_pad = -(-R_pad // 128) * 128
    nb = i0.shape[0]
    G = min(G, nb)
    while nb % G:
        G //= 2
    dirs32 = jax.lax.bitcast_convert_type(
        dirs16.reshape(nrows, B, nl // 2, 2), jnp.int32)
    ij = jnp.stack([i0.astype(jnp.int32), j0.astype(jnp.int32),
                    t0.astype(jnp.int32)])
    kernel = functools.partial(
        _walk_group_kernel, G=G, R_pad=R_pad, nrows=nrows, ncols=nl)
    ent, used = pl.pallas_call(
        kernel,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, R_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, nb), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((G, 8, min(128, nl // 2)), jnp.int32),
            pltpu.SMEM((G, 1, R_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ij, dirs32)
    return ent.reshape(nb, R_pad), used[0]
