import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _pallas_rowdirs, _pallas_rowscan, rowscan_prep)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
    _pallas_rowcb)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

rng = np.random.default_rng(7)
B, m, n = 128, 2048, 2048
cells = B * m * n

def pipelined(fn, sync, iters=6):
    outs = [fn() for _ in range(2)]
    for o in outs: sync(o)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    for o in outs: sync(o)
    return (time.perf_counter() - t0) / iters

args, meta = rowscan_prep(
    rng.integers(65, 69, size=(B, m)).astype(np.uint8),
    rng.integers(65, 69, size=(B, n)).astype(np.uint8),
    np.full(B, m, np.int32), np.full(B, n, np.int32), carries=17)
dev = [jnp.asarray(x) for x in args]
st = jnp.asarray(np.full((args[0].shape[0], 128), -1, np.int32))
kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False)
m2 = dict(meta); m2.pop("uniform_la")
print("block_b:", meta["block_b"], flush=True)
for runs in (False, True):
    dt = pipelined(lambda: _pallas_rowdirs(*dev[:4], st, with_runs=runs,
                                           **kw, **m2),
                   lambda o: np.asarray(o[1][:1, :1]))
    print(f"rowdirs whole-row runs={runs}: {dt*1000:.1f} ms "
          f"{cells/dt/1e9:.2f} GCUPS", flush=True)
dt = pipelined(lambda: _pallas_rowscan(*dev[:4], start_type=-1, **kw,
                                       **meta),
               lambda o: np.asarray(o[:1, :1]))
print(f"rowscan score whole-row: {dt*1000:.1f} ms {cells/dt/1e9:.2f} GCUPS",
      flush=True)
