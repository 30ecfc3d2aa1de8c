"""Overlap (dovetail) mode: scores/traceback vs the serial oracle."""

import numpy as np

from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
from cse305_parallel_sequence_alignment_tpu.models.overlap import (
    OVERLAP_PARAMS,
    OverlapBatchAligner,
    ov_oracle_best,
)


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_overlap_scores_vs_oracle():
    rng = np.random.default_rng(111)
    pairs = [(rand_seq(rng, m), rand_seq(rng, n))
             for (m, n) in [(20, 30), (25, 25), (40, 15), (8, 50)]]
    scores, tables, eis, ejs = OverlapBatchAligner().score_batch(pairs)
    for k, (a, b) in enumerate(pairs):
        want, wt, wi, wj = ov_oracle_best(a, b)
        assert scores[k] == want, (k, scores[k], want)
        assert (tables[k], eis[k], ejs[k]) == (wt, wi, wj), k


def test_overlap_suffix_prefix():
    """A's suffix == B's prefix: the canonical dovetail."""
    rng = np.random.default_rng(112)
    core = rand_seq(rng, 22)
    a = rand_seq(rng, 18) + core            # ...core]
    b = core + rand_seq(rng, 25)            # [core...
    res = OverlapBatchAligner().align_batch([(a, b)])[0]
    assert res.score == OVERLAP_PARAMS.match * len(core)
    assert res.cigar == f"{len(core)}M"
    # aligned core ends at A's end and starts at B's start
    assert res.a_span == (len(a) - len(core) + 1, len(a))
    assert res.b_span == (1, len(core))


def test_overlap_chain_rescores():
    rng = np.random.default_rng(113)
    g, h, match, mismatch = OVERLAP_PARAMS.astuple()
    for _ in range(5):
        a, b = rand_seq(rng, 30), rand_seq(rng, 35)
        res = OverlapBatchAligner().align_batch([(a, b)])[0]
        score, prev = 0.0, None
        for (i, j, t) in res.chain:
            if t == 1:
                score += match if a[i - 1] == b[j - 1] else mismatch
            else:
                score -= g + (h if t != prev else 0.0)
            prev = t
        assert score == res.score, (a, b, res.chain)


def test_overlap_other_params():
    rng = np.random.default_rng(114)
    params = ScoringParams(g=2, h=1, match=2, mismatch=-3)
    a, b = rand_seq(rng, 28), rand_seq(rng, 44)
    scores, tables, eis, ejs = OverlapBatchAligner(
        params=params).score_batch([(a, b)])
    want, wt, wi, wj = ov_oracle_best(a, b, params)
    assert scores[0] == want
    assert (tables[0], eis[0], ejs[0]) == (wt, wi, wj)
