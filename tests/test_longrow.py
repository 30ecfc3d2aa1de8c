"""Column-chunked Pallas long fill vs the whole-row engines."""

import numpy as np
import jax.numpy as jnp

from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
    pallas_long_score_batch,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import (
    PAD_A,
    PAD_B,
    wavefront_score_batch,
)


def _rand(rng, B, bm, bn):
    a = np.full((B, bm), PAD_A, np.uint8)
    b = np.full((B, bn), PAD_B, np.uint8)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for k in range(B):
        la[k] = int(rng.integers(1, bm + 1))
        lb[k] = int(rng.integers(1, bn + 1))
        a[k, : la[k]] = rng.integers(65, 69, la[k])
        b[k, : lb[k]] = rng.integers(65, 69, lb[k])
    return a, b, la, lb


def test_longrow_matches_wavefront_across_chunk_geometries():
    rng = np.random.default_rng(7)
    for (B, bm, bn, cc, rc) in [(3, 50, 300, 128, 16),
                                (5, 200, 700, 256, 64),
                                (2, 120, 129, 128, 32)]:
        a, b, la, lb = _rand(rng, B, bm, bn)
        for st in (-1, -2, -3):
            want = np.asarray(wavefront_score_batch(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                jnp.asarray(lb), start_type=st))
            got = pallas_long_score_batch(
                a, b, la, lb, start_type=st, chunk_cols=cc, rc=rc)
            assert np.array_equal(got, want), (B, bm, bn, cc, rc, st)


def test_longrow_scoring_params():
    rng = np.random.default_rng(9)
    a, b, la, lb = _rand(rng, 4, 150, 400)
    want = np.asarray(wavefront_score_batch(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb),
        g=2.0, h=5.0, match=3.0, mismatch=-2.0))
    got = pallas_long_score_batch(a, b, la, lb, g=2.0, h=5.0, match=3.0,
                                  mismatch=-2.0, chunk_cols=256, rc=32)
    assert np.array_equal(got, want)


def test_batch_aligner_routes_long_buckets():
    """BatchAligner uses the chunked kernel past the whole-row limit
    (interpret path on CPU; asserted via score equality)."""
    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
    )

    rng = np.random.default_rng(11)
    pairs = [("".join(rng.choice(list("ACGT"), 600)),
              "".join(rng.choice(list("ACGT"), 700))) for _ in range(3)]
    ba = BatchAligner(backend="pallas", long_threshold=512)
    sc, _ = ba.score_batch(pairs)
    want, _ = BatchAligner(backend="wavefront").score_batch(pairs)
    assert np.array_equal(sc, want)


def test_long_lastrow_matches_rowscan_lastrow():
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        pallas_long_lastrow,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.rowscan import (
        rowscan_lastrow,
    )
    rng = np.random.default_rng(11)
    for (m, n, cc, rc) in [(37, 300, 128, 16), (0, 50, 128, 16),
                           (64, 129, 128, 32)]:
        a = rng.integers(65, 69, m).astype(np.uint8)
        b = rng.integers(65, 69, n).astype(np.uint8)
        for st in (-1, -2, 3):
            want = np.asarray(rowscan_lastrow(
                jnp.asarray(a), jnp.asarray(b), start_type=st))
            got = pallas_long_lastrow(a, b, start_type=st, chunk_cols=cc,
                                      rc=rc)
            assert np.array_equal(got, want), (m, n, cc, rc, st)


def test_batched_crossings_matches_serial():
    """One batched fwd+rev device fill per level == serial
    crossing_on_row (values, argmax position, and tie-break)."""
    from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        batched_crossings,
    )
    from cse305_parallel_sequence_alignment_tpu.parallel.partition import (
        crossing_on_row,
    )

    rng = np.random.default_rng(23)
    params = ScoringParams()
    tasks = []
    for (m, n, st, en) in [(60, 90, -1, -1), (45, 70, 1, -1),
                           (33, 40, 2, 3), (80, 30, 3, 1),
                           (17, 260, 1, 2), (64, 64, -1, 1)]:
        a = rng.integers(65, 69, m).astype(np.uint8)
        b = rng.integers(65, 69, n).astype(np.uint8)
        tasks.append((a, b, m // 2, st, en))
    got = batched_crossings(tasks, chunk_cols=128, rc=16)
    for (a, b, i_mid, st, en), (j, t, best) in zip(tasks, got):
        jw, tw, bw = crossing_on_row(a, b, i_mid, params, st, en)
        assert (j, t) == (jw, tw), (st, en, (j, t), (jw, tw))
        assert best == bw, (st, en, best, bw)


def test_balanced_partition_batched_equals_serial():
    from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        batched_crossings,
    )
    from cse305_parallel_sequence_alignment_tpu.parallel.partition import (
        balanced_partition,
    )

    rng = np.random.default_rng(31)
    a = rng.integers(65, 69, 210).astype(np.uint8)
    b = rng.integers(65, 69, 290).astype(np.uint8)
    want = balanced_partition(a, b, 5, ScoringParams())
    got = balanced_partition(
        a, b, 5, ScoringParams(),
        crossings_fn=lambda tasks: batched_crossings(
            tasks, chunk_cols=128, rc=16))
    assert got == want


def test_batched_crossings_wide_block_levels():
    """Deep bisection levels (>= 8 crossings -> 16 jobs) take the
    adaptive wide-block path (block_b > 8); results must still match
    the serial search."""
    from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_longrow import (
        batched_crossings,
    )
    from cse305_parallel_sequence_alignment_tpu.parallel.partition import (
        crossing_on_row,
    )

    rng = np.random.default_rng(61)
    params = ScoringParams()
    tasks = []
    for q in range(9):
        m = int(rng.integers(30, 90))
        n = int(rng.integers(40, 200))
        a = rng.integers(65, 69, m).astype(np.uint8)
        b = rng.integers(65, 69, n).astype(np.uint8)
        st = (-1, 1, 2, 3)[q % 4]
        en = (-1, 3, 1, 2)[q % 4]
        tasks.append((a, b, m // 2, st, en))
    got = batched_crossings(tasks, chunk_cols=128, rc=16)
    for (a, b, i_mid, st, en), (j, t, best) in zip(tasks, got):
        jw, tw, bw = crossing_on_row(a, b, i_mid, params, st, en)
        assert (j, t, best) == (jw, tw, bw), (st, en)
