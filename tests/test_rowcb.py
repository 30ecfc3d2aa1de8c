"""Column-blocked kernel == whole-row kernels (cell/byte equality)."""

import numpy as np

from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
    _default_interpret,
    _pallas_rowdirs,
    pallas_rowscan_score_batch,
    rowscan_prep,
)
from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
    pallas_rowcb_dirs_batch,
    pallas_rowcb_score_batch,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B


def _rand(rng, B, bm, bn):
    a = np.full((B, bm), PAD_A, np.uint8)
    b = np.full((B, bn), PAD_B, np.uint8)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for k in range(B):
        la[k] = int(rng.integers(1, bm + 1))
        lb[k] = int(rng.integers(1, bn + 1))
        a[k, : la[k]] = rng.integers(65, 69, la[k])
        b[k, : lb[k]] = rng.integers(65, 69, lb[k])
    return a, b, la, lb


def test_rowcb_score_matches_rowscan():
    rng = np.random.default_rng(3)
    # widths straddling the 1024-lane column block boundary
    for (B, bm, bn) in [(4, 60, 90), (3, 70, 1100), (2, 50, 2200)]:
        a, b, la, lb = _rand(rng, B, bm, bn)
        for st in (-1, -2, 3):
            want = pallas_rowscan_score_batch(a, b, la, lb,
                                              start_type=st)
            got = pallas_rowcb_score_batch(a, b, la, lb, start_type=st)
            assert np.array_equal(got, want), (B, bm, bn, st)


def test_rowcb_dirs_matches_rowdirs():
    rng = np.random.default_rng(5)
    for (B, bm, bn) in [(4, 60, 90), (2, 40, 1500)]:
        a, b, la, lb = _rand(rng, B, bm, bn)
        for st, runs in ((-1, True), (1, False), (2, True)):
            args, meta = rowscan_prep(a, b, la, lb, carries=17)
            meta.pop("uniform_la", None)
            stm = np.full((args[0].shape[0], 128), st, np.int32)
            dw, fw = _pallas_rowdirs(
                *args[:4], stm, with_runs=runs, g=1.0, h=2.0, match=1.0,
                mismatch=0.0, interpret=_default_interpret(None), **meta)
            fc, dc = pallas_rowcb_dirs_batch(
                a, b, la, lb, start_type=st, with_runs=runs,
                device_dirs=True)
            dw, dc = np.asarray(dw), np.asarray(dc)
            B_ = B
            assert np.array_equal(np.asarray(fw)[:B_, :3], fc)
            # compare real pairs only (padding batch rows differ by
            # block_b rounding)
            assert np.array_equal(dw[:, :B_, :], dc[:, :B_, :]), (bm, bn,
                                                                  st, runs)


def test_rowcb_perm_layout_equivalence():
    """Within-block permuted rowcb (round 5): finals identical and dirs
    equal after per-block column unpermutation; the fused path's
    perm_cb walk is covered by test_rowcb_fused_align_matches (the
    production path now defaults perm=True)."""
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _default_interpret as _di,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _blocks,
        _pallas_rowcb,
        rowcb_prep,
    )

    rng = np.random.default_rng(9)
    for (B, bm, bn) in [(3, 40, 300), (2, 50, 2200)]:
        a, b, la, lb = _rand(rng, B, bm, bn)
        outs = {}
        for perm in (False, True):
            args, meta = rowcb_prep(a, b, la, lb, -1, carries=13,
                                    perm=perm)
            assert meta["perm"] is perm
            dirs, fin = _pallas_rowcb(
                *args, g=1.0, h=2.0, match=1.0, mismatch=0.0,
                interpret=_di(None), want_dirs=True, with_runs=True,
                **meta)
            outs[perm] = (np.asarray(dirs), np.asarray(fin))
        d0, f0 = outs[False]
        d1, f1 = outs[True]
        assert np.array_equal(f0, f1), (bm, bn)
        nl = d0.shape[2]
        dp = np.empty_like(d1)
        for (s, w) in _blocks(nl):
            tn = w // 128
            q = np.arange(w)
            j_of_q = (q % 128) * tn + q // 128 if tn > 1 else q
            dp[:, :, s + j_of_q] = d1[:, :, s: s + w]
        assert np.array_equal(dp[:, :B, :], d0[:, :B, :]), (bm, bn)


def test_rowcb_runs2_walk_equivalence():
    """runs2 dirs (run + first-gap-step fusion, round 5): the fused
    walk's replayed chains are identical to the runs1 walk's."""
    import jax
    import jax.numpy as jnp

    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        _end_choice_vec,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.device_walk import (
        _walk_core_rle,
        expand_rle_ops,
        replay_ops,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill import (
        _default_interpret as _di,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _pallas_rowcb,
        rowcb_prep,
    )

    rng = np.random.default_rng(11)
    for (B, bm, bn) in [(4, 70, 90), (2, 120, 1200)]:
        a, b, la, lb = _rand(rng, B, bm, bn)
        args, meta = rowcb_prep(a, b, la, lb, -1, carries=13, perm=True)
        kw = dict(g=1.0, h=2.0, match=1.0, mismatch=0.0,
                  interpret=_di(None), want_dirs=True, with_runs=True)
        outs = {}
        for r2 in (False, True):
            dirs, fin = _pallas_rowcb(*args, runs2=r2, **kw, **meta)
            outs[r2] = (dirs, np.asarray(fin))
        assert np.array_equal(outs[False][1], outs[True][1])
        tables, _ = _end_choice_vec(outs[False][1][:B, :3], -1, 2.0)
        ms = int(la.max() + lb.max()) + 1
        streams = {}
        for r2 in (False, True):
            ent, used = jax.jit(lambda d, i, j, t, r2=r2: _walk_core_rle(
                d, i, j, t, max_steps=ms, perm_cb=True, runs2=r2))(
                outs[r2][0], jnp.asarray(la), jnp.asarray(lb),
                jnp.asarray(tables))
            ops = expand_rle_ops(np.asarray(ent).T, ms)
            if ops.shape[1] < ms:
                ops = np.pad(ops, ((0, 0), (0, ms - ops.shape[1])))
            streams[r2] = replay_ops(ops, la.astype(np.int64),
                                     lb.astype(np.int64),
                                     tables.astype(np.int64))
        for x, y in zip(streams[False], streams[True]):
            assert np.array_equal(x, y), (bm, bn)


def test_rowcb_fused_align_matches():
    """BatchAligner fused path (now rowcb) == wavefront on ragged
    pairs wider than one column block."""
    from cse305_parallel_sequence_alignment_tpu.models.batch import (
        BatchAligner,
    )

    rng = np.random.default_rng(7)
    pairs = [("".join(rng.choice(list("ACGT"), int(rng.integers(30, 80)))),
              "".join(rng.choice(list("ACGT"), int(rng.integers(1000,
                                                                1400)))))
             for _ in range(4)]
    got = BatchAligner(backend="pallas").align_batch(pairs)
    want = BatchAligner(backend="wavefront").align_batch(pairs)
    for g_, w_ in zip(got, want):
        assert g_.score == w_.score
        assert g_.chain == w_.chain
        assert g_.aligned_a == w_.aligned_a
