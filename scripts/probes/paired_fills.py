import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _pallas_rowdirs, _pallas_rowscan)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import _pallas_rowcb
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

rng = np.random.default_rng(7)
B, m, n = 256, 2048, 2048
nl, ma = 2176, 2304
cells = B * m * n
a_pad = np.full((B, ma), int(PAD_A), np.int32)
a_pad[:B, :m] = rng.integers(65, 69, size=(B, m))
b_ext = np.full((B, nl), int(PAD_B), np.int32)
b_ext[:B, 1:n+1] = rng.integers(65, 69, size=(B, n))
lbm = np.zeros((B, nl), np.int32); lbm[:B, n] = 1
la = np.full((B, 128), -1, np.int32); la[:B] = m
st = np.full((B, 128), -1, np.int32)
dev = [jnp.asarray(x) for x in (a_pad, b_ext, lbm, la, st)]

def t2(fn, sync, iters=4):
    prev = fn(); sync(prev)
    t0 = time.perf_counter()
    prev = fn()
    for _ in range(iters - 1):
        cur = fn(); sync(prev); prev = cur
    sync(prev)
    return (time.perf_counter() - t0) / iters

kw = dict(m=m, n=n, nl=nl, g=1.0, h=2.0, match=1.0, mismatch=0.0,
          interpret=False)
cands = {
  "rowscan_score_bb64": (lambda: _pallas_rowscan(
      *dev[:4], start_type=-1, block_b=64, uniform_la=True, **kw),
      lambda o: np.asarray(o[:1, :1])),
  "rowdirs16_bb64": (lambda: _pallas_rowdirs(
      *dev, block_b=64, with_runs=True, **kw),
      lambda o: np.asarray(o[1][:1, :1])),
  "rowcb16_bb64_k2": (lambda: _pallas_rowcb(
      *dev, block_b=64, k_steps=2, want_dirs=True, with_runs=True, **kw),
      lambda o: np.asarray(o[1][:1, :1])),
  "rowcb16_bb64_k8": (lambda: _pallas_rowcb(
      *dev, block_b=64, k_steps=8, want_dirs=True, with_runs=True, **kw),
      lambda o: np.asarray(o[1][:1, :1])),
}
for rnd in range(2):
    for name, (fn, sync) in cands.items():
        try:
            dt = t2(fn, sync)
            print(f"[{rnd}] {name}: {dt*1000:.1f} ms  "
                  f"{cells/dt/1e9:.2f} GCUPS", flush=True)
        except Exception as e:
            print(f"[{rnd}] {name}: {type(e).__name__} {str(e)[:100]}",
                  flush=True)
