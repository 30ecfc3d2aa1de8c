import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.models.batch import BatchAligner
from cse305_parallel_sequence_alignment_tpu.ops.device_walk import expand_rle_ops, replay_ops

rng = np.random.default_rng(5)
pairs = [("".join(rng.choice(list("ACGT"), 2048)),
          "".join(rng.choice(list("ACGT"), 2048))) for _ in range(128)]
ba = BatchAligner(backend="pallas")
res = ba.align_batch(pairs)  # compile

enc_a, enc_b, buckets = ba._prep(pairs)
(key, idxs), = buckets.items()
a, b, la, lb = ba._bucket_arrays(enc_a, enc_b, idxs, key)

# 1. dispatch + scores-only sync
for _ in range(2):
    t0 = time.perf_counter()
    h = ba._dispatch_fused(a, b, la, lb)
    entries_d, used_d, tables_d, scores_d, max_steps = h
    used, tables, scores = jax.device_get((used_d, tables_d, scores_d))
    t1 = time.perf_counter()
    rcap = entries_d.shape[0]
    rpad = min(rcap, -(-max(int(used), 1) // 256) * 256)
    ent = jax.device_get(entries_d[:rpad])
    t2 = time.perf_counter()
    ops = expand_rle_ops(ent.T[:128], max_steps)
    tt, ii, jj, lens = replay_ops(ops[:, :max_steps],
                                  la.astype(np.int64), lb.astype(np.int64),
                                  tables.astype(np.int64), mode="parity")
    t3 = time.perf_counter()
    print(f"dispatch+scores {1000*(t1-t0):.1f}ms  entfetch({rpad}r,"
          f"{rpad*128/1024:.0f}KB) {1000*(t2-t1):.1f}ms  "
          f"replay {1000*(t3-t2):.1f}ms  used={int(used)} "
          f"meansteps={lens.mean():.0f}", flush=True)

# 2. render-only timing via full align_batch already measured; time host emit
t0 = time.perf_counter()
res = ba.align_batch(pairs)
print(f"align_batch total {1000*(time.perf_counter()-t0):.1f}ms", flush=True)
