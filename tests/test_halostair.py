"""Halo-staircase sharded pipeline vs the XLA body and single-chip
fills (8-device CPU mesh, kernel in interpret mode)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
from cse305_parallel_sequence_alignment_tpu.ops.rowscan import (
    rowscan_lastrow,
    rowscan_score,
)
from cse305_parallel_sequence_alignment_tpu.parallel.longseq import (
    longseq_lastrow,
    longseq_score,
)


def _pair(rng, m, n):
    return (rng.integers(65, 69, size=(m,)).astype(np.uint8),
            rng.integers(65, 69, size=(n,)).astype(np.uint8))


@pytest.mark.parametrize("start", [-1, -2, 3])
def test_halostair_score_matches_rowscan(start):
    rng = np.random.default_rng(41)
    a, b = _pair(rng, 300, 700)
    got = longseq_score(a, b, start_type=start, row_chunk=128,
                        backend="kernel")
    want = np.asarray(rowscan_score(a, b, start_type=start))
    np.testing.assert_array_equal(got, want)


def test_halostair_score_matches_xla_body():
    rng = np.random.default_rng(43)
    for (m, n) in [(65, 2100), (257, 1023), (513, 300)]:
        a, b = _pair(rng, m, n)
        got = longseq_score(a, b, row_chunk=128, backend="kernel")
        want = longseq_score(a, b, row_chunk=64, backend="xla")
        np.testing.assert_array_equal(got, want, err_msg=f"{m}x{n}")


@pytest.mark.parametrize("start", [-1, -2])
def test_halostair_lastrow_matches_rowscan(start):
    rng = np.random.default_rng(47)
    a, b = _pair(rng, 200, 900)
    got = longseq_lastrow(a, b, start_type=start, row_chunk=128,
                          backend="kernel")
    want = np.asarray(rowscan_lastrow(a, b, start_type=start))
    np.testing.assert_array_equal(got, want)


def test_halostair_one_device_mesh():
    """D = 1 degenerates to a single-chip staircase fill (the
    VERDICT r3 item-1 configuration measured on hardware)."""
    rng = np.random.default_rng(53)
    a, b = _pair(rng, 260, 520)
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("seq",))
    got = longseq_score(a, b, mesh=mesh1, row_chunk=128,
                        backend="kernel")
    want = np.asarray(rowscan_score(a, b))
    np.testing.assert_array_equal(got, want)


def test_halostair_params_and_neg_h_fallback():
    rng = np.random.default_rng(59)
    a, b = _pair(rng, 150, 400)
    p = ScoringParams(g=2, h=3)
    got = longseq_score(a, b, params=p, row_chunk=128, backend="kernel")
    want = np.asarray(rowscan_score(a, b, g=2.0, h=3.0))
    np.testing.assert_array_equal(got, want)
    # h < 0 silently routes to the XLA body (2-carry fold needs h >= 0)
    pneg = ScoringParams(g=1, h=-1)
    got = longseq_score(a, b, params=pneg, backend="kernel")
    want = np.asarray(rowscan_score(a, b, g=1.0, h=-1.0))
    np.testing.assert_array_equal(got, want)
