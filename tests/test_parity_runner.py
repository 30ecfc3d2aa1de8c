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


def test_live_parity_kb_scale():
    """Byte parity at kb scale (1.2 kb x 1.5 kb dataset slices) — the
    regime where engine disagreements (tie-breaks, boundary handling)
    would actually surface."""
    from cse305_parallel_sequence_alignment_tpu.utils.fasta import (
        read_and_store_sequences,
    )
    _, seqs = read_and_store_sequences(
        "/root/reference/gene_sequences_test")
    pairs = [(seqs[3][:1200], seqs[11][:1500]),
             (seqs[8][:1000], seqs[8][500:1500])]
    ok, mismatches = run_parity(pairs, driver=driver)
    assert ok, [(m["a"][:40], m["b"][:40]) for m in mismatches]


def test_live_parity_equal_lengths():
    pairs = sample_dataset_pairs(
        "/root/reference/gene_sequences_test", count=4, max_len=80,
        seed=7)
    pairs = [(a[: min(len(a), len(b))], b[: min(len(a), len(b))])
             for a, b in pairs]
    ok, mismatches = run_parity(pairs, driver=driver)
    assert ok, mismatches
