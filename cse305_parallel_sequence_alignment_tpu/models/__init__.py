"""Aligner model families: oracle, global (Gotoh), local, semi-global, batch."""

from cse305_parallel_sequence_alignment_tpu.models.oracle import (
    oracle_align,
    oracle_tables,
)

__all__ = ["oracle_align", "oracle_tables"]
