import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.models.batch import BatchAligner

rng = np.random.default_rng(5)
pairs = [("".join(rng.choice(list("ACGT"), int(rng.integers(40, 120)))),
          "".join(rng.choice(list("ACGT"), int(rng.integers(40, 120)))))
         for _ in range(17)]
dev = BatchAligner(backend="pallas")
host = BatchAligner(backend="wavefront")
t0 = time.perf_counter()
got = dev.align_batch(pairs)
print(f"small batch first (compile): {time.perf_counter()-t0:.2f}s", flush=True)
want = host.align_batch(pairs)
for k, (g_, w_) in enumerate(zip(got, want)):
    assert g_.score == w_.score, (k, g_.score, w_.score)
    assert g_.chain == w_.chain, k
    assert g_.aligned_a == w_.aligned_a
print("correctness OK (17 ragged pairs, chip)", flush=True)

pairs = [("".join(rng.choice(list("ACGT"), 2048)),
          "".join(rng.choice(list("ACGT"), 2048))) for _ in range(128)]
ba = BatchAligner(backend="pallas")
t0 = time.perf_counter()
res = ba.align_batch(pairs)
print(f"2kb batch first (compile): {time.perf_counter()-t0:.2f}s", flush=True)
for trial in range(3):
    t0 = time.perf_counter()
    res = ba.align_batch(pairs)
    dt = time.perf_counter() - t0
    cells = sum(len(a) * len(b) for a, b in pairs)
    print(f"trial {trial}: {dt*1000:.1f} ms  {len(pairs)/dt:.0f} pairs/s  "
          f"{cells/dt/1e9:.2f} e2e GCUPS", flush=True)
w = host.align_batch(pairs[:2])
assert res[0].score == w[0].score and res[0].chain == w[0].chain
assert res[1].aligned_b == w[1].aligned_b
print("2kb spot check OK", flush=True)
