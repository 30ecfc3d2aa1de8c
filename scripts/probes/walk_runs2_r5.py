import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import _pallas_rowcb, rowcb_prep
from cse305_parallel_sequence_alignment_tpu.ops.device_walk import _walk_core_rle
from cse305_parallel_sequence_alignment_tpu.models.batch import _end_choice_vec
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
dirs = {}
for r2 in (False, True):
    d, fin = _pallas_rowcb(*dev, runs2=r2, **kw, **meta)
    np.asarray(fin[:1,:1]); dirs[r2] = (d, fin)
tables, _ = _end_choice_vec(np.asarray(dirs[False][1])[:B,:3], -1, 2.0)
ms = m + n + 1
tb = jnp.asarray(tables); lad = jnp.asarray(la); lbd = jnp.asarray(lb)
walks = {}
for r2 in (False, True):
    walks[r2] = jax.jit(lambda d, r2=r2: _walk_core_rle(
        d, lad, lbd, tb, max_steps=ms, perm_cb=True, runs2=r2)[0])
    np.asarray(walks[r2](dirs[r2][0])[:1,:1])
def timed(f, d):
    np.asarray(f(d)[:1,:1])
    t0=time.perf_counter()
    for _ in range(4): o=f(d)
    np.asarray(o[:1,:1]); return (time.perf_counter()-t0)/4
for rnd in range(3):
    for r2 in (False, True):
        dt = timed(walks[r2], dirs[r2][0])
        print(json.dumps({"round": rnd, "runs2": r2, "walk_ms": round(dt*1e3,2)}), flush=True)
