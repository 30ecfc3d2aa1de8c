import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import pallas_rowscan_score_batch
rng = np.random.default_rng(7)
a = rng.integers(65, 69, size=(256, 2048)).astype(np.uint8)
b = rng.integers(65, 69, size=(256, 2048)).astype(np.uint8)
la = np.full(256, 2048, np.int32); lb = np.full(256, 2048, np.int32)
t0 = time.perf_counter()
out = pallas_rowscan_score_batch(a, b, la, lb)
print(f"rowscan 2kb x256 first: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
out = pallas_rowscan_score_batch(a, b, la, lb)
dt = time.perf_counter()-t0
print(f"warm: {dt:.3f}s -> {256*2048*2048/dt/1e9:.1f} GCUPS", flush=True)
