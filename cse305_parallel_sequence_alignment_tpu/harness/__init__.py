"""Benchmark harness: the reference's three experiments + GCUPS reporting."""
