import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
    _pallas_banded, _pallas_banded_dirs, banded_prep)
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(7)
B, m, n = 256, 2048, 2048
a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
la = np.full((B,), m, np.int32); lb = np.full((B,), n, np.int32)
wlo = whi = 256
W = wlo + whi + 1
args, meta = banded_prep(a, b, la, lb, wlo, whi)
dev = [jnp.asarray(x) for x in args]
cells = B * m * W
kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1, interpret=False)
fns = {}
fns["score_fori"] = lambda: _pallas_banded(*dev, **kw, **meta)
for ks in (32, 128):
    fns[f"dirs_grid_k{ks}"] = (lambda ks=ks: _pallas_banded_dirs(
        *dev, **kw, k_steps=ks, **meta)[1])
for name, f in list(fns.items()):
    t0=time.perf_counter()
    try:
        np.asarray(f()[:1,:1] if name!="score_fori" else f())
        print(json.dumps({"compile": name, "s": round(time.perf_counter()-t0,1),
                          "block_b": meta["block_b"]}), flush=True)
    except Exception as e:
        print(json.dumps({"compile_error": name, "err": str(e)[:200]}), flush=True)
        del fns[name]
def timed(f):
    for _ in range(2): np.asarray(f()[:1,:1])
    t0=time.perf_counter()
    for _ in range(4): o=f()
    np.asarray(o[:1,:1]); return (time.perf_counter()-t0)/4
for rnd in range(3):
    for name, f in fns.items():
        dt = timed(f)
        print(json.dumps({"round": rnd, "name": name,
                          "gcups_band": round(cells/dt/1e9,2)}), flush=True)
