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


def test_pallas_banded_dirs_matches_xla_bytes():
    """Band-layout dirs kernel: finals and every in-band byte equal the
    XLA banded_dirs fill."""
    from cse305_parallel_sequence_alignment_tpu.ops.banded import (
        banded_dirs,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
        pallas_banded_dirs_batch,
    )
    rng = np.random.default_rng(41)
    B, bm, bn, w = 4, 40, 46, 12
    a = rng.integers(65, 69, size=(B, bm)).astype(np.uint8)
    b = rng.integers(65, 69, size=(B, bn)).astype(np.uint8)
    # ragged lengths: bytes past each pair's (la, lb) must be zeroed so
    # the emitted matrix equals the per-pair XLA fill byte-for-byte
    # (on-chip validation caught unmasked in-band-at-padded-n cells)
    la = np.array([bm, bm - 5, bm, bm - 9], np.int64)
    lb = np.array([bn, bn - 7, bn - 11, bn], np.int64)
    for st in (-1, -2, 3):
        fin, dirs = pallas_banded_dirs_batch(a, b, la, lb, w, w + 8,
                                             start_type=st, interpret=True)
        for k in range(B):
            wf, wd = banded_dirs(a[k, : la[k]], b[k, : lb[k]], w, w + 8,
                                 start_type=st)
            np.testing.assert_array_equal(fin[k], wf, err_msg=f"{k} {st}")
            W = 2 * w + 9
            np.testing.assert_array_equal(
                dirs[: la[k] + 1, k, :W], wd, err_msg=f"pair {k} st {st}")


def test_banded_aligner_pallas_backend_matches():
    """BandedAligner backend='pallas' (interpret on CPU): device-walked
    chains equal the XLA + host band walk."""
    from cse305_parallel_sequence_alignment_tpu.models.banded import (
        BandedAligner,
    )
    rng = np.random.default_rng(43)
    for _ in range(4):
        m = int(rng.integers(20, 60))
        n = m + int(rng.integers(-6, 7))
        a = "".join(rng.choice(list("ACGT"), m))
        b = "".join(rng.choice(list("ACGT"), n))
        for mode in ("parity", "full"):
            got = BandedAligner(w_lo=16, w_hi=16, backend="pallas",
                                traceback_mode=mode).align(a, b)
            want = BandedAligner(w_lo=16, w_hi=16, backend="wavefront",
                                 traceback_mode=mode).align(a, b)
            assert got.score == want.score
            assert got.chain == want.chain
            assert got.aligned_a == want.aligned_a
