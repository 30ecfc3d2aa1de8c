import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _pallas_rowdirs, _pallas_rowscan, rowscan_prep)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
    _pallas_rowcb, rowcb_prep)

rng = np.random.default_rng(7)
B, m, n = 128, 2048, 2048
a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
la = np.full(B, m, np.int32); lb = np.full(B, n, np.int32)
cells = B * m * n

def pipelined(fn, sync, iters=6):
    outs = [fn() for _ in range(2)]
    for o in outs: sync(o)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    for o in outs: sync(o)
    return (time.perf_counter() - t0) / iters

args, meta = rowcb_prep(a, b, la, lb)
dev = [jnp.asarray(x) for x in args]
kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False, **meta)

for wd, wr, tag in ((False, False, "rowcb score"),
                    (True, False, "rowcb dirs8"),
                    (True, True, "rowcb dirs16+runs")):
    dt = pipelined(lambda: _pallas_rowcb(*dev, want_dirs=wd,
                                         with_runs=wr, **kw),
                   lambda o: np.asarray(o[1][:1, :1]))
    print(f"{tag}: {dt*1000:.1f} ms  {cells/dt/1e9:.2f} GCUPS", flush=True)

args2, meta2 = rowscan_prep(a, b, la, lb, carries=17)
dev2 = [jnp.asarray(x) for x in args2]
st = jnp.asarray(np.full((args2[0].shape[0], 128), -1, np.int32))
kw2 = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False)
m2 = dict(meta2); m2.pop("uniform_la")
dt = pipelined(lambda: _pallas_rowdirs(*dev2[:4], st, with_runs=True,
                                       **kw2, **m2),
               lambda o: np.asarray(o[1][:1, :1]))
print(f"rowdirs16 (whole-row): {dt*1000:.1f} ms  {cells/dt/1e9:.2f} GCUPS",
      flush=True)
dt = pipelined(lambda: _pallas_rowscan(*dev2[:4], **kw2, **meta2),
               lambda o: np.asarray(o[:1, :1]))
print(f"rowscan score (whole-row): {dt*1000:.1f} ms  {cells/dt/1e9:.2f} GCUPS",
      flush=True)
