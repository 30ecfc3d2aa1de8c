import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import _pallas_rowcb, rowcb_prep
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(7)
B, m, n = 128, 2048, 2048
a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
la = np.full((B,), m, np.int32); lb = np.full((B,), n, np.int32)
args, meta = rowcb_prep(a, b, la, lb, carries=13, perm=True)
dev = [jnp.asarray(x) for x in args]
kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False, k_steps=2,
          want_dirs=True, with_runs=True)
fns = {r2: (lambda r2=r2: _pallas_rowcb(*dev, runs2=r2, **kw, **meta)) for r2 in (False, True)}
for r2, f in fns.items():
    np.asarray(f()[1][:1,:1])
def timed(f):
    prev = f(); np.asarray(prev[1][:1,:1])
    t0=time.perf_counter(); prev=f()
    for _ in range(5):
        cur=f(); np.asarray(prev[1][:1,:1]); prev=cur
    np.asarray(prev[1][:1,:1]); return (time.perf_counter()-t0)/6
for rnd in range(3):
    for r2, f in fns.items():
        dt = timed(f)
        print(json.dumps({"round": rnd, "runs2": r2, "fill_ms": round(dt*1e3,2),
                          "gcups": round(B*m*n/dt/1e9,2)}), flush=True)
