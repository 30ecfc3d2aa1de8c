"""Round-4: banded kernel ablation — find the 7x gap to the op model.

Variants (wrong math where noted, perf only): full, no-capture,
no-prefix-max, no-charcol (fixed fb). Run:
    python scripts/probes/banded_ablate_r4.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import cse305_parallel_sequence_alignment_tpu.ops.pallas_banded as pb
    import cse305_parallel_sequence_alignment_tpu.ops.pallas_fill as pf
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_banded import (
        _pallas_banded,
        banded_prep,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    B, m, n = 64, 2048, 2048
    wlo = whi = 256
    W = wlo + whi + 1
    a = rng.integers(65, 69, size=(B, m)).astype(np.uint8)
    b = rng.integers(65, 69, size=(B, n)).astype(np.uint8)
    la = np.full((B,), m, np.int32)
    lb = np.full((B,), n, np.int32)
    cells = B * m * W

    def emit(**row):
        print(json.dumps(row), flush=True)

    def rate(fn, iters=8):
        for _ in range(2):
            np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        return cells / ((time.perf_counter() - t0) / iters) / 1e9

    args, meta = banded_prep(a, b, la, lb, wlo, whi)
    dev = [jnp.asarray(x) for x in args]
    kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1,
              interpret=False, **meta)
    emit(kind="geometry", block_b=meta["block_b"], Wl=meta["Wl"])

    fn = lambda: _pallas_banded(*dev, **kw)  # noqa: E731
    t0 = time.perf_counter()
    np.asarray(fn())
    emit(kind="banded_full", compile_s=round(time.perf_counter() - t0, 1),
         gcups_band=round(rate(fn), 2))

    # ablate the prefix max (wrong math)
    orig_pm = pb._lane_prefix_max

    def fake_pm(x, w):
        return x
    pb._lane_prefix_max = fake_pm
    try:
        fn2 = lambda: _pallas_banded(  # noqa: E731
            *dev, **{**kw, "g": 1.0 + 2 ** -20})
        np.asarray(fn2())
        emit(kind="banded_no_pm", gcups_band=round(rate(fn2), 2))
    except Exception as e:  # noqa: BLE001
        emit(kind="banded_no_pm", error=str(e)[:200])
    pb._lane_prefix_max = orig_pm

    # ablate the per-row char fetches (wrong math)
    orig_cc = pb._char_col

    def fake_cc(ref, idx):
        return jnp.full((ref.shape[0], 1), 65, jnp.int32)
    pb._char_col = fake_cc
    try:
        fn3 = lambda: _pallas_banded(  # noqa: E731
            *dev, **{**kw, "g": 1.0 + 2 ** -19})
        np.asarray(fn3())
        emit(kind="banded_no_charcol", gcups_band=round(rate(fn3), 2))
    except Exception as e:  # noqa: BLE001
        emit(kind="banded_no_charcol", error=str(e)[:200])
    pb._char_col = orig_cc

    # both ablated
    pb._lane_prefix_max = fake_pm
    pb._char_col = fake_cc
    try:
        fn4 = lambda: _pallas_banded(  # noqa: E731
            *dev, **{**kw, "g": 1.0 + 2 ** -18})
        np.asarray(fn4())
        emit(kind="banded_no_pm_no_cc", gcups_band=round(rate(fn4), 2))
    except Exception as e:  # noqa: BLE001
        emit(kind="banded_no_pm_no_cc", error=str(e)[:200])
    pb._lane_prefix_max = orig_pm
    pb._char_col = orig_cc

    # reference pin: the global rowscan at the same moment
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _pallas_rowscan,
        rowscan_prep,
    )
    args_r, meta_r = rowscan_prep(a, b, la, lb, carries=7)
    dev_r = [jnp.asarray(x) for x in args_r]
    kwr = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0, start_type=-1,
               interpret=False, **meta_r)
    fnp = lambda: _pallas_rowscan(*dev_r, **kwr)  # noqa: E731
    np.asarray(fnp())
    t0 = time.perf_counter()
    for _ in range(4):
        o = fnp()
    np.asarray(o)
    dt = (time.perf_counter() - t0) / 4
    emit(kind="pin_rowscan_full_matrix",
         gcups=round(B * m * n / dt / 1e9, 2))


if __name__ == "__main__":
    main()
