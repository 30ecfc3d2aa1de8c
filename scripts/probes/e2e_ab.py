import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.models import batch as MB
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _pallas_rowscan, rowscan_prep)

rng = np.random.default_rng(5)
pairs = [("".join(rng.choice(list("ACGT"), 2048)),
          "".join(rng.choice(list("ACGT"), 2048))) for _ in range(128)]
a = np.array([[ord(c) for c in p[0]] for p in pairs], np.uint8)
b = np.array([[ord(c) for c in p[1]] for p in pairs], np.uint8)
la = np.full(128, 2048, np.int32); lb = la.copy()
args, meta = rowscan_prep(a, b, la, lb)
dev = [jnp.asarray(x) for x in args]
kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1,
          interpret=False, **meta)

def ref_rate():
    outs = [_pallas_rowscan(*dev, **kw) for _ in range(2)]
    for o in outs: np.asarray(o[:1, :1])
    t0 = time.perf_counter()
    outs = [_pallas_rowscan(*dev, **kw) for _ in range(4)]
    for o in outs: np.asarray(o[:1, :1])
    dt = (time.perf_counter() - t0) / 4
    return 128 * 2048 * 2048 / dt / 1e9

ba = MB.BatchAligner(backend="pallas")
ba.align_batch(pairs)
print(f"ref rowscan: {ref_rate():.1f} GCUPS", flush=True)
for split, tag in ((False, "1chunk"), (True, "2chunk")):
    MB.BatchAligner._SPLIT = split
    # monkey-toggle: patch the split condition via dirs_budget
    ba2 = MB.BatchAligner(backend="pallas",
                          max_batch=64 if split else 512)
    ba2.align_batch(pairs)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ba2.align_batch(pairs)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag}: best {dt*1000:.1f} ms {128/dt:.0f} pairs/s "
          f"(all: {' '.join(f'{t*1000:.0f}' for t in ts)})", flush=True)
print(f"ref rowscan after: {ref_rate():.1f} GCUPS", flush=True)
