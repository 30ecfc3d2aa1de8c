"""Pallas local (SW) kernels vs the pure-JAX local fill (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from cse305_parallel_sequence_alignment_tpu.models.local_oracle import (
    sw_oracle_align,
)
from cse305_parallel_sequence_alignment_tpu.ops.local import sw_score_batch
from cse305_parallel_sequence_alignment_tpu.ops.pallas_local import (
    pallas_sw_dirs_batch,
    pallas_sw_score_batch,
)
from cse305_parallel_sequence_alignment_tpu.ops.traceback import (
    traceback_local_from_dirs,
)

from tests.test_pallas import make_batch


def test_pallas_sw_score_matches_wavefront():
    rng = np.random.default_rng(21)
    a, b, la, lb, _ = make_batch(rng, 10, 14, 18)
    got = pallas_sw_score_batch(a, b, la, lb, block_b=8, interpret=True)
    want = np.asarray(sw_score_batch(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb)))
    np.testing.assert_array_equal(got, want)


def test_pallas_sw_dirs_traceback_matches_oracle():
    rng = np.random.default_rng(22)
    a, b, la, lb, pairs = make_batch(rng, 6, 12, 15, min_len=4)
    best, dirs = pallas_sw_dirs_batch(a, b, la, lb, block_b=8,
                                      interpret=True)
    for k, (s1, s2) in enumerate(pairs):
        want_score, want_chain = sw_oracle_align(s1, s2)
        assert best[k, 0] == want_score, (s1, s2)
        if want_score == 0.0:
            continue
        chain = traceback_local_from_dirs(
            dirs[:, k, :], int(best[k, 1]), int(best[k, 2]), layout="skew")
        assert chain == want_chain, (s1, s2)
