"""Live parity vs the repaired reference binary (built on the fly).

Skipped when the reference tree or a C++ toolchain is unavailable; the
offline golden cases (tests/golden/cases.jsonl) cover parity in that case.
"""

import pytest

from cse305_parallel_sequence_alignment_tpu.harness.parity import (
    build_reference,
    run_parity,
    sample_dataset_pairs,
)

driver = build_reference(work_dir="/tmp/refparity_shared")

pytestmark = pytest.mark.skipif(
    driver is None, reason="reference binary unavailable")


def test_live_parity_on_dataset_samples():
    pairs = sample_dataset_pairs(
        "/root/reference/gene_sequences_test", count=6, max_len=120,
        seed=123)
    ok, mismatches = run_parity(pairs, driver=driver)
    assert ok, mismatches


def test_live_parity_equal_lengths():
    pairs = sample_dataset_pairs(
        "/root/reference/gene_sequences_test", count=4, max_len=80,
        seed=7)
    pairs = [(a[: min(len(a), len(b))], b[: min(len(a), len(b))])
             for a, b in pairs]
    ok, mismatches = run_parity(pairs, driver=driver)
    assert ok, mismatches
