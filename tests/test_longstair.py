"""Sublane-staircase long fill == longrow lastrow (cell equality)."""

import numpy as np

from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
    pallas_long_lastrow,
)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_longstair import (
    stair_lastrow,
)


def test_stair_lastrow_matches_longrow():
    rng = np.random.default_rng(13)
    # m around/below the sublane ramp, n crossing super-chunk edges
    for (m, n, nl_c, rc) in [(37, 300, 128, 16), (5, 64, 128, 16),
                             (64, 1100, 128, 32), (130, 2500, 256, 64)]:
        a = rng.integers(65, 69, m).astype(np.uint8)
        b = rng.integers(65, 69, n).astype(np.uint8)
        for st in (-1, -2, 3):
            want = pallas_long_lastrow(a, b, start_type=st,
                                       chunk_cols=512, rc=64)
            got = stair_lastrow(a, b, start_type=st, nl_c=nl_c, rc=rc)
            assert np.array_equal(got, want), (m, n, nl_c, rc, st)


def test_stair_lastrow_params():
    rng = np.random.default_rng(17)
    a = rng.integers(65, 69, 90).astype(np.uint8)
    b = rng.integers(65, 69, 700).astype(np.uint8)
    want = pallas_long_lastrow(a, b, g=2.0, h=5.0, match=3.0,
                               mismatch=-2.0, chunk_cols=256, rc=32)
    got = stair_lastrow(a, b, g=2.0, h=5.0, match=3.0, mismatch=-2.0,
                        nl_c=128, rc=16)
    assert np.array_equal(got, want)


def test_batched_crossings_stair_path_matches_serial():
    """Forcing the staircase route (stair_threshold=0) reproduces the
    serial crossing search exactly."""
    from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        batched_crossings,
    )
    from cse305_parallel_sequence_alignment_tpu.parallel.partition import (
        crossing_on_row,
    )

    rng = np.random.default_rng(29)
    params = ScoringParams()
    tasks = []
    for (m, n, st, en) in [(60, 90, -1, -1), (45, 260, 1, 2)]:
        a = rng.integers(65, 69, m).astype(np.uint8)
        b = rng.integers(65, 69, n).astype(np.uint8)
        tasks.append((a, b, m // 2, st, en))
    got = batched_crossings(tasks, stair_threshold=0)
    for (a, b, i_mid, st, en), (j, t, best) in zip(tasks, got):
        jw, tw, bw = crossing_on_row(a, b, i_mid, params, st, en)
        assert (j, t, best) == (jw, tw, bw), (st, en)
