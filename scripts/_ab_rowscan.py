"""Throwaway A/B: rowscan capture vs uniform_la kernels on the chip."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from cse305_parallel_sequence_alignment_tpu.ops import pallas_fill as pf

B, m, n = 256, 2048, 2048
rng = np.random.default_rng(7)
a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
la = np.full((B,), m, np.int32)
lb = np.full((B,), n, np.int32)

nl = -(-(n + 1) // 128) * 128
ma = max(-(-m // 128) * 128, 128) + 128
block_b = pf._fit_block_b(pf.DEF_BLOCK_B, 2 * (ma + 2 * nl + 256) + 7 * nl)
Bp = -(-B // block_b) * block_b
a_pad = np.full((Bp, ma), int(pf.PAD_A), np.int32)
a_pad[:B, :m] = a
b_ext = np.full((Bp, nl), int(pf.PAD_B), np.int32)
b_ext[:B, 1:n + 1] = b
lbmask = np.zeros((Bp, nl), np.int32)
lbmask[np.arange(B), lb.astype(np.int64)] = 1
lac = np.full((Bp, 128), -1, np.int32)
lac[:B] = la[:, None]


def run(uniform, unroll=4):
    kw = dict(m=m, n=n, nl=nl, g=1.0, h=2.0, match=1.0, mismatch=0.0,
              start_type=-1, block_b=block_b, interpret=False,
              uniform_la=uniform, unroll=unroll)
    out = np.asarray(pf._pallas_rowscan(a_pad, b_ext, lbmask, lac, **kw))
    t0 = time.perf_counter()
    for _ in range(3):
        out = np.asarray(pf._pallas_rowscan(a_pad, b_ext, lbmask, lac,
                                            **kw))
    dt = (time.perf_counter() - t0) / 3
    return out[:B, :3], B * m * n / dt / 1e9


ref, g_cap = run(False)
print(f"capture baseline: {g_cap:.2f} GCUPS")
for unroll in (2, 4, 8, 16):
    uni, g_uni = run(True, unroll)
    ok = np.array_equal(ref, uni)
    print(f"uniform unroll={unroll}: {g_uni:.2f} GCUPS "
          f"({g_uni / g_cap:.2f}x capture)  equal={ok}")
