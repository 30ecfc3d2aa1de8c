"""Headline benchmark: batched Gotoh fill throughput in GCUPS on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N}

Baseline = 0.0115 GCUPS, the repaired reference binary's best measured
single-core cell-update rate (BASELINE.md: 2000x2000, p=1). The benchmark
fills batches of 2 kb x 2 kb pairs (BASELINE.json config 3 shape) with the
device-native batched wavefront kernel (Pallas on TPU) and reports
aggregate cell updates/sec.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_GCUPS = 0.0115


def _bench(batch=256, m=2048, n=2048, iters=3):
    import jax

    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
    )

    rng = np.random.default_rng(7)
    a = rng.integers(65, 69, size=(batch, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(batch, n)).astype(np.uint8)
    la = np.full((batch,), m, np.int32)
    lb = np.full((batch,), n, np.int32)

    aligner = BatchAligner()
    # warmup (compile)
    aligner._finals(a[:batch], b[:batch], la, lb)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = aligner._finals(a, b, la, lb)
    dt = (time.perf_counter() - t0) / iters
    assert np.all(np.isfinite(np.asarray(out)[:, 0]))
    cells = batch * m * n
    return cells / dt / 1e9, jax.default_backend()


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    gcups, backend = _bench(batch=batch)
    print(json.dumps({
        "metric": f"batched 2kb-pair Gotoh fill, 1 chip ({backend})",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 1),
    }))


if __name__ == "__main__":
    main()
