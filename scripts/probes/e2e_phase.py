import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.models import batch as MB

rng = np.random.default_rng(5)
pairs = [("".join(rng.choice(list("ACGT"), 2048)),
          "".join(rng.choice(list("ACGT"), 2048))) for _ in range(128)]
ba = MB.BatchAligner(backend="pallas")
ba.align_batch(pairs)  # compile

# instrument phases
orig_dispatch = MB.BatchAligner._dispatch_fused
orig_collect = MB.BatchAligner._collect_fused
orig_emit = MB.BatchAligner._emit_chunk
T = {}
def wrap(name, orig):
    def f(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        T[name] = T.get(name, 0) + time.perf_counter() - t0
        return out
    return f
MB.BatchAligner._dispatch_fused = wrap("dispatch", orig_dispatch)
MB.BatchAligner._collect_fused = wrap("collect", orig_collect)
MB.BatchAligner._emit_chunk = wrap("emit", orig_emit)
for trial in range(3):
    T.clear()
    t0 = time.perf_counter()
    res = ba.align_batch(pairs)
    tot = time.perf_counter() - t0
    other = tot - sum(T.values())
    print(f"trial {trial}: total {tot*1000:.1f}ms  " +
          "  ".join(f"{k} {v*1000:.1f}ms" for k, v in T.items()) +
          f"  prep/other {other*1000:.1f}ms", flush=True)
