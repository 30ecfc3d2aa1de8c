"""Pallas banded kernel vs the XLA banded fill (interpret mode)."""

import numpy as np
import pytest

from cse305_parallel_sequence_alignment_tpu.ops.banded import banded_score
from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
    pallas_banded_score_batch,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B


def make_ragged_batch(rng, count, bm, bn, w_lo, w_hi):
    a = np.full((count, bm), PAD_A, np.uint8)
    b = np.full((count, bn), PAD_B, np.uint8)
    la = np.zeros(count, np.int32)
    lb = np.zeros(count, np.int32)
    for k in range(count):
        # lengths constrained so the band covers (la, lb)
        m = int(rng.integers(5, bm + 1))
        lo = max(1, m - w_lo)
        hi = min(bn, m + w_hi)
        n = int(rng.integers(lo, hi + 1))
        la[k], lb[k] = m, n
        a[k, :m] = rng.integers(65, 69, m)
        b[k, :n] = rng.integers(65, 69, n)
    return a, b, la, lb


@pytest.mark.parametrize("band", [(4, 4), (10, 6), (0, 8)])
def test_pallas_banded_matches_xla(band):
    w_lo, w_hi = band
    rng = np.random.default_rng(131)
    a, b, la, lb = make_ragged_batch(rng, 9, 30, 36, w_lo, w_hi)
    got = pallas_banded_score_batch(a, b, la, lb, w_lo, w_hi, block_b=8,
                                    interpret=True)
    for k in range(len(la)):
        want = banded_score(a[k, : la[k]], b[k, : lb[k]], w_lo, w_hi)
        np.testing.assert_array_equal(got[k], want, err_msg=str(k))


@pytest.mark.parametrize("start", [-2, 3])
def test_pallas_banded_boundary_types(start):
    rng = np.random.default_rng(132)
    a, b, la, lb = make_ragged_batch(rng, 5, 20, 24, 6, 6)
    got = pallas_banded_score_batch(a, b, la, lb, 6, 6, start_type=start,
                                    block_b=8, interpret=True)
    for k in range(len(la)):
        want = banded_score(a[k, : la[k]], b[k, : lb[k]], 6, 6,
                            start_type=start)
        np.testing.assert_array_equal(got[k], want, err_msg=str(k))
