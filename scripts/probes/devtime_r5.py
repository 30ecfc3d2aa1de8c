"""Device-time (iteration-scaled) rates for the round-5 kernels:
halostair at 8/12/16 kb, rowcb dirs16+runs at 2kb x 256, banded W513.
The tunnel's per-dispatch overhead cancels in the K2-K1 difference."""
import sys, time, json, functools
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(7)

def iter_rate(make_iterated, cells, Ks=(1, 5), reps=3):
    ts = {}
    for K in Ks:
        f = make_iterated(K)
        np.asarray(f())
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f()
        np.asarray(o)
        ts[K] = (time.perf_counter() - t0) / reps
    dt = max((ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0]), 1e-9)
    return cells / dt / 1e9, ts

# --- halostair D=1 at several widths ---
import cse305_parallel_sequence_alignment_tpu.parallel.longseq as ls
from cse305_parallel_sequence_alignment_tpu.ops.pallas_halostair import pick_geometry
from cse305_parallel_sequence_alignment_tpu.core import ScoringParams
mesh1 = Mesh(np.array(jax.devices()[:1]), ("seq",))
for L in (8192, 12288, 16384, 32768):
    aa = rng.integers(65, 69, size=(L,)).astype(np.uint8)
    bb = rng.integers(65, 69, size=(L,)).astype(np.uint8)
    m = n = L
    D = 1
    nc = -(-(n + 1) // D)
    S, nl_c = pick_geometry(nc)
    R = 1024
    C = -(-m // R)
    W = 128 + C * R + 256
    a_pad = np.full((1, W), 65 + 200, np.int32)  # PAD_A-ish; use real pad
    from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B
    a_pad[:] = int(PAD_A)
    a_pad[0, 128: 128 + m] = aa
    b_sub = np.full((D * S * nl_c,), int(PAD_B), np.int32)
    b_sub[1: n + 1] = bb
    b_sub = b_sub.reshape(D * S, nl_c)
    a_dev = jax.device_put(jnp.asarray(a_pad), NamedSharding(mesh1, P()))
    b_dev = jax.device_put(jnp.asarray(b_sub), NamedSharding(mesh1, P("seq")))
    g, h, match, mismatch = ScoringParams().astuple()
    hold = ls._MeshHolder(mesh1)
    def make(K, a_dev=a_dev, b_dev=b_dev, S=S, nl_c=nl_c, R=R, C=C, hold=hold, m=m, n=n):
        @functools.partial(jax.jit, static_argnames=("K",))
        def it(a0, b0, *, K):
            def body(c, _):
                a2 = a0.at[0, 0].set(a0[0, 0] + (c[0] * 0).astype(a0.dtype))
                fin, row = ls._halostair_jit(
                    a2, b0, jnp.int32(m), jnp.int32(n), S, nl_c, R, C, 1,
                    g, h, match, mismatch, -1, False, hold)
                return fin.reshape(-1)[:1].astype(jnp.float32), ()
            out, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=K)
            return out
        return lambda: it(a_dev, b_dev, K=K)
    try:
        rate, ts = iter_rate(make, L * L)
        print(json.dumps({"kernel": "halostair_1dev", "L": L, "S": S, "nl_c": nl_c,
                          "device_gcups": round(rate, 2),
                          "t1": round(ts[1]*1e3,1), "t5": round(ts[5]*1e3,1)}), flush=True)
    except Exception as e:
        print(json.dumps({"kernel": "halostair_1dev", "L": L, "error": str(e)[:200]}), flush=True)

# --- rowcb dirs16+runs 2kb x 256 ---
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import _pallas_rowcb, rowcb_prep
B, m2, n2 = 256, 2048, 2048
a2 = rng.integers(65, 69, size=(B, m2)).astype(np.uint8)
b2 = rng.integers(65, 69, size=(B, n2)).astype(np.uint8)
la = np.full((B,), m2, np.int32); lb = np.full((B,), n2, np.int32)
args, meta = rowcb_prep(a2, b2, la, lb, carries=11, perm=True)
dev = [jnp.asarray(x) for x in args]
kwc = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, interpret=False, k_steps=2)
def make_cb(K):
    @functools.partial(jax.jit, static_argnames=("K",))
    def it(a0, b0, c0, d0, e0, *, K):
        def body(c, _):
            a_k = a0.at[0, 0].set(a0[0, 0] + (c[0] * 0).astype(a0.dtype))
            dirs, fin = _pallas_rowcb(a_k, b0, c0, d0, e0, want_dirs=True,
                                      with_runs=True, **kwc, **meta)
            return fin[:1, 0], ()
        out, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=K)
        return out
    return lambda: it(*dev, K=K)
try:
    rate, ts = iter_rate(make_cb, B * m2 * n2, Ks=(1, 4))
    print(json.dumps({"kernel": "rowcb_dirs16runs_2kb_b256",
                      "device_gcups": round(rate, 2),
                      "t1": round(ts[1]*1e3,1), "t4": round(ts[4]*1e3,1)}), flush=True)
except Exception as e:
    print(json.dumps({"kernel": "rowcb_dirs", "error": str(e)[:200]}), flush=True)

# --- banded W513 2kb x 256 ---
from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import _pallas_banded, banded_prep
argsb, metab = banded_prep(a2, b2, la, lb, 256, 256)
devb = [jnp.asarray(x) for x in argsb]
kwb = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1, interpret=False)
def make_bd(K):
    @functools.partial(jax.jit, static_argnames=("K",))
    def it(a0, b0, c0, d0, e0, *, K):
        def body(c, _):
            a_k = a0.at[0, 0].set(a0[0, 0] + (c[0] * 0).astype(a0.dtype))
            o = _pallas_banded(a_k, b0, c0, d0, e0, **kwb, **metab)
            return o[:1, 0], ()
        out, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=K)
        return out
    return lambda: it(*devb, K=K)
try:
    rate, ts = iter_rate(make_bd, B * m2 * 513, Ks=(1, 5))
    print(json.dumps({"kernel": "banded_W513_2kb_b256",
                      "device_gcups_band": round(rate, 2),
                      "t1": round(ts[1]*1e3,1), "t5": round(ts[5]*1e3,1)}), flush=True)
except Exception as e:
    print(json.dumps({"kernel": "banded", "error": str(e)[:200]}), flush=True)
