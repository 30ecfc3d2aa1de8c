"""Pallas per-pair walk kernel vs the XLA RLE walk (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cse305_parallel_sequence_alignment_tpu.models.batch import (
    BatchAligner,
    _end_choice_vec,
)
from cse305_parallel_sequence_alignment_tpu.ops.device_walk import (
    _walk_core_rle,
)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _pallas_rowdirs,
    rowscan_prep,
)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_walk import (
    pallas_walk_rle,
)


def _dirs16(rng, B, bm, bn):
    a = np.full((B, bm), 65, np.uint8)
    b = np.full((B, bn), 65, np.uint8)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for k in range(B):
        la[k] = int(rng.integers(1, bm + 1))
        lb[k] = int(rng.integers(1, bn + 1))
        a[k, : la[k]] = rng.integers(65, 69, la[k])
        b[k, : lb[k]] = rng.integers(65, 69, lb[k])
    args, meta = rowscan_prep(a, b, la, lb, carries=17)
    meta.pop("uniform_la", None)
    st = np.full((args[0].shape[0], 128), -1, np.int32)
    d16, fin = _pallas_rowdirs(*args[:4], st, with_runs=True,
                               interpret=True, g=1.0, h=2.0, match=1.0,
                               mismatch=0.0, **meta)
    tables, _ = _end_choice_vec(np.asarray(fin)[:B, :3], -1, 2.0)
    return d16, la, lb, tables.astype(np.int32)


def test_pallas_walk_matches_xla_walk():
    rng = np.random.default_rng(61)
    B, bm, bn = 6, 80, 95
    d16, la, lb, tables = _dirs16(rng, B, bm, bn)
    ms = bm + bn + 1
    ent_x, _ = jax.jit(functools.partial(
        _walk_core_rle, max_steps=ms, pair_axis=1))(
        d16, jnp.asarray(la), jnp.asarray(lb), jnp.asarray(tables))
    ent_p, used_p = pallas_walk_rle(
        d16, jnp.asarray(la), jnp.asarray(lb), jnp.asarray(tables),
        R_pad=ms, interpret=True)
    ex = np.asarray(ent_x).T
    ep = np.asarray(ent_p)
    up = np.asarray(used_p)
    for r in range(B):
        xs = ex[r][ex[r] != 0]
        ps = ep[r][: int(up[r])]
        assert np.array_equal(xs, ps.astype(np.uint16)), r


def test_fused_align_with_pallas_walk_matches_wavefront():
    """backend="pallas" on CPU runs the whole fused path (rowcb fill +
    XLA walk in interpret; the pallas walk itself engages on TPU) —
    this pins the surrounding plumbing; the kernel equivalence test
    above pins the walk itself."""
    rng = np.random.default_rng(67)
    pairs = []
    for _ in range(5):
        m = int(rng.integers(10, 60))
        n = int(rng.integers(10, 60))
        pairs.append(
            ("".join(rng.choice(list("ACGT"), m)),
             "".join(rng.choice(list("ACGT"), n))))
    fused = BatchAligner(backend="pallas", parity_swap=False)
    plain = BatchAligner(backend="wavefront", parity_swap=False)
    got = fused.align_batch(pairs)
    want = plain.align_batch(pairs)
    for g_, w_ in zip(got, want):
        assert g_.score == w_.score
        assert list(g_.chain) == list(w_.chain)
        assert g_.aligned_a == w_.aligned_a
