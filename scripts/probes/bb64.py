import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import _pallas_rowdirs, _pallas_rowscan
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

rng = np.random.default_rng(7)
B, m, n = 128, 2048, 2048
nl, ma = 2176, 2304
cells = B * m * n
Bp = 128
a_pad = np.full((Bp, ma), int(PAD_A), np.int32)
a_pad[:B, :m] = rng.integers(65, 69, size=(B, m))
b_ext = np.full((Bp, nl), int(PAD_B), np.int32)
b_ext[:B, 1:n+1] = rng.integers(65, 69, size=(B, n))
lbm = np.zeros((Bp, nl), np.int32); lbm[:B, n] = 1
la = np.full((Bp, 128), -1, np.int32); la[:B] = m
st = np.full((Bp, 128), -1, np.int32)
dev = [jnp.asarray(x) for x in (a_pad, b_ext, lbm, la, st)]

def pipelined(fn, sync, iters=6):
    outs = [fn() for _ in range(2)]
    for o in outs: sync(o)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    for o in outs: sync(o)
    return (time.perf_counter() - t0) / iters

kw = dict(m=m, n=n, nl=nl, g=1.0, h=2.0, match=1.0, mismatch=0.0,
          interpret=False)
for bb in (64,):
    for ks in (8, 4):
        try:
            dt = pipelined(lambda: _pallas_rowdirs(*dev, block_b=bb,
                                                   k_steps=ks,
                                                   with_runs=True, **kw),
                           lambda o: np.asarray(o[1][:1, :1]))
            print(f"rowdirs16 bb={bb} k={ks}: {dt*1000:.1f} ms "
                  f"{cells/dt/1e9:.2f} GCUPS", flush=True)
        except Exception as e:
            print(f"bb={bb} k={ks}: {type(e).__name__} {str(e)[:140]}",
                  flush=True)
# score at bb=64 for reference (r2 headline config)
try:
    dt = pipelined(lambda: _pallas_rowscan(*dev[:4], start_type=-1,
                                           block_b=64, **kw),
                   lambda o: np.asarray(o[:1, :1]))
    print(f"rowscan bb=64: {dt*1000:.1f} ms {cells/dt/1e9:.2f} GCUPS",
          flush=True)
except Exception as e:
    print("rowscan bb=64:", type(e).__name__, str(e)[:140], flush=True)
