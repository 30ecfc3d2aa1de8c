import sys, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.sharding import Mesh
import cse305_parallel_sequence_alignment_tpu.ops.pallas_halostair as hs
import cse305_parallel_sequence_alignment_tpu.parallel.longseq as ls
from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(7)
mesh1 = Mesh(np.array(jax.devices()[:1]), ("seq",))
for L in (12288, 8192, 16384):
    aa = rng.integers(65, 69, size=(L,)).astype(np.uint8)
    bb = rng.integers(65, 69, size=(L,)).astype(np.uint8)
    geoms = {12288: [(56,256),(32,512),(16,1024),(8,2048)],
             8192: [(40,256),(24,512),(16,1024),(8,2048)],
             16384: [(72,256),(40,512),(24,1024),(16,2048)]}[L]
    want = None
    for (S, nl_c) in geoms:
        hs.pick_geometry = lambda nc, max_S=96, S=S, nl_c=nl_c: (S, nl_c)
        try:
            t0=time.perf_counter()
            s = np.asarray(ls.longseq_score(aa, bb, ScoringParams(), mesh=mesh1, row_chunk=1024))
            ct = time.perf_counter()-t0
            if want is None: want = s
            ok = bool(np.array_equal(s, want))
            t0=time.perf_counter()
            for _ in range(3):
                o = ls.longseq_score(aa, bb, ScoringParams(), mesh=mesh1, row_chunk=1024)
            np.asarray(o)
            dt = (time.perf_counter()-t0)/3
            print(json.dumps({"L": L, "S": S, "nl_c": nl_c, "compile_s": round(ct,1),
                              "score_ok": ok, "gcups": round(L*L/dt/1e9,2)}), flush=True)
        except Exception as e:
            print(json.dumps({"L": L, "S": S, "nl_c": nl_c, "error": str(e)[:150]}), flush=True)
