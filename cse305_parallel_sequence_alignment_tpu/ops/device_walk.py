"""On-device batched traceback: walk the packed direction matrix ON the
accelerator and ship only 2-bit op codes to the host.

Motivation (measured): the evaluation TPU is reached through a tunnel
moving device->host data at ~7 MB/s, so transferring a 2 kb-pair batch's
direction matrix (hundreds of MB) costs more than a thousand fills. The
walk itself is sequential per pair but trivially batched: one XLA
fori_loop performs per-step gathers dirs[i+j, b, j] for all pairs at
once and records the successor-table codes; the host replays the moves
(no matrix needed — the code sequence fully determines the path) with
exactly the semantics of ops/traceback.py / the native walker
(reference subproblem_alignment.cpp:105-172, quirks B1-B3).

Layout: the Pallas "skew-T" dirs (m+n+1, B, n+1-padded), pair axis 1.
"""

from __future__ import annotations

import functools

import numpy as np

from cse305_parallel_sequence_alignment_tpu.core import (
    DIR_T1_SHIFT,
    DIR_T2_SHIFT,
    DIR_T3_SHIFT,
)


@functools.partial(
    __import__("jax").jit, static_argnames=("max_steps",))
def _device_walk(dirs, la, lb, tables, *, max_steps):
    """(B, max_steps) uint8 successor-table codes (0 = step not taken).

    Step semantics mirror traceback.py's parity loop: while i>0 and j>0,
    read the current cell's code for the CURRENT table, move by the
    current table, record the successor table.
    """
    import jax
    import jax.numpy as jnp

    # dirs' pair axis may be padded past the real batch (block rounding)
    B = la.shape[0]
    bidx = jnp.arange(B)
    shifts = jnp.array([0, DIR_T1_SHIFT, DIR_T2_SHIFT, DIR_T3_SHIFT],
                       jnp.int32)

    def step(k, state):
        i, j, t, done, ops = state
        byte = dirs[i + j, bidx, j].astype(jnp.int32)
        code = (byte >> shifts[t]) & 3
        t_next = code + 1
        active = ~done
        di = jnp.where((t == 1) | (t == 3), 1, 0)
        dj = jnp.where((t == 1) | (t == 2), 1, 0)
        i2 = jnp.where(active, i - di, i)
        j2 = jnp.where(active, j - dj, j)
        ops = jax.lax.dynamic_update_slice(
            ops, jnp.where(active, t_next, 0).astype(jnp.uint8)[:, None],
            (0, k))
        t = jnp.where(active, t_next, t)
        done = done | (i2 == 0) | (j2 == 0)
        return i2, j2, t, done, ops

    i0 = la.astype(jnp.int32)
    j0 = lb.astype(jnp.int32)
    t0 = tables.astype(jnp.int32)
    done0 = (i0 == 0) | (j0 == 0)
    ops0 = jnp.zeros((B, max_steps), jnp.uint8)
    _, _, _, _, ops = jax.lax.fori_loop(
        0, max_steps, step, (i0, j0, t0, done0, ops0))
    return ops


def walk_batch_device(dirs_dev, la, lb, tables, mode="parity",
                      offsets=None, chunk=None):
    """Chains for every pair, walking on-device.

    Args:
      dirs_dev: device (or host) uint8 array in skew-T pallas layout
        (m+n+1, B, nl).
      la, lb, tables: (B,) end coordinates and end tables.
      mode: "parity" (B1: stop at the edge, drop the first point) or
        "full" (emit forced edge runs to (0,0)).
      offsets: optional per-pair (id_a, id_b) global offsets, indexed by
        ``chunk`` (models/batch.py convention).
    Returns: list of chains (list of (i, j, t) tuples, quirk B2 zeros).
    """
    import jax.numpy as jnp

    la = np.asarray(la, np.int64)
    lb = np.asarray(lb, np.int64)
    tables = np.asarray(tables, np.int64)
    max_steps = int(la.max(initial=0) + lb.max(initial=0)) + 1
    ops = np.asarray(_device_walk(
        dirs_dev, jnp.asarray(la, jnp.int32), jnp.asarray(lb, jnp.int32),
        jnp.asarray(tables, jnp.int32), max_steps=max_steps))

    chains = []
    for r in range(len(la)):
        if offsets is not None and chunk is not None:
            id_a, id_b = offsets[chunk[r]]
        else:
            id_a, id_b = 0, 0

        def point(pi, pj, t):
            if t == 1:
                return (pi + id_a, pj + id_b, 1)
            if t == 2:
                return (0, pj + id_b, 2)
            return (pi + id_a, 0, 3)

        i, j, t = int(la[r]), int(lb[r]), int(tables[r])
        rev = [point(i, j, t)]
        k = 0
        row = ops[r]
        while i > 0 and j > 0:
            t_next = int(row[k])
            k += 1
            if t == 1:
                i -= 1
                j -= 1
            elif t == 2:
                j -= 1
            else:
                i -= 1
            rev.append(point(i, j, t_next))
            t = t_next
        if mode == "full":
            while j > 0:
                rev.append(point(0, j - 1, 2))
                j -= 1
            while i > 0:
                rev.append(point(i - 1, 0, 3))
                i -= 1
        chains.append(list(reversed(rev))[1:])
    return chains
