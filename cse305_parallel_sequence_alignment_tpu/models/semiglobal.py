"""Bucketed batched semi-global aligner (A end-to-end, B free flanks).

Device fill: ops/semiglobal.py; host walk:
ops.traceback.traceback_semiglobal_from_dirs; CIGARs via ops/cigar.py.
Includes the serial numpy oracle used by the tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from cse305_parallel_sequence_alignment_tpu.core import (
    NEG_INF,
    ScoringParams,
    encode_seq,
)
from cse305_parallel_sequence_alignment_tpu.ops.cigar import (
    chain_to_cigar,
    chain_to_cigar_extended,
)
from cse305_parallel_sequence_alignment_tpu.ops.semiglobal import (
    semiglobal_dirs_batch,
    semiglobal_score_batch,
)
from cse305_parallel_sequence_alignment_tpu.ops.traceback import (
    traceback_semiglobal_from_dirs,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B


def sg_oracle_tables(a, b, params=ScoringParams()):
    """Serial semi-global tables: row 0 of T1 is free (zeros)."""
    a = encode_seq(a) if isinstance(a, (str, bytes)) else np.asarray(a)
    b = encode_seq(b) if isinstance(b, (str, bytes)) else np.asarray(b)
    m, n = len(a), len(b)
    g, h, match, mismatch = params.astuple()
    T1 = np.full((m + 1, n + 1), NEG_INF, np.float32)
    T2 = np.full((m + 1, n + 1), NEG_INF, np.float32)
    T3 = np.full((m + 1, n + 1), NEG_INF, np.float32)
    T1[0, :] = 0.0
    for i in range(1, m + 1):
        T3[i, 0] = -h - g * i
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            f = match if a[i - 1] == b[j - 1] else mismatch
            T1[i, j] = f + max(T1[i - 1, j - 1], T2[i - 1, j - 1],
                               T3[i - 1, j - 1])
            T3[i, j] = max(T1[i - 1, j] - g - h, T2[i - 1, j] - g - h,
                           T3[i - 1, j] - g)
            T2[i, j] = max(T1[i, j - 1] - g - h, T2[i, j - 1] - g,
                           T3[i, j - 1] - g - h)
    return T1, T2, T3


def sg_oracle_best(a, b, params=ScoringParams()):
    """(score, table, end_j): best over row m, T1 >= T2 >= T3 then
    smallest j (j >= 1)."""
    T1, T2, T3 = sg_oracle_tables(a, b, params)
    m = T1.shape[0] - 1
    best, bt, bj = float(NEG_INF), 1, 0
    for j in range(1, T1.shape[1]):
        for t, T in ((1, T1), (2, T2), (3, T3)):
            if T[m, j] > best:
                best, bt, bj = float(T[m, j]), t, j
    return best, bt, bj


@dataclasses.dataclass
class SemiGlobalResult:
    score: float
    chain: list
    cigar: str
    cigar_extended: str
    target_span: tuple  # (first, last) 1-based B columns aligned
    end_table: int


@dataclasses.dataclass
class SemiGlobalBatchAligner:
    """Aligns many (query, target) pairs semi-globally, length-bucketed."""

    params: ScoringParams = ScoringParams(g=1.0, h=2.0, match=1.0,
                                          mismatch=-1.0)
    bucket_quantum: int = 128
    max_batch: int = 512
    backend: str = "auto"  # score path: Pallas on TPU, wavefront else

    def _kw(self):
        g, h, match, mismatch = self.params.astuple()
        return dict(g=g, h=h, match=match, mismatch=mismatch)

    def _use_pallas(self):
        if self.backend == "pallas":
            return True
        if self.backend == "wavefront":
            return False
        import jax
        return jax.default_backend() == "tpu"

    def _prep(self, pairs):
        enc_a = [encode_seq(p[0]) if isinstance(p[0], (str, bytes))
                 else np.asarray(p[0], np.uint8) for p in pairs]
        enc_b = [encode_seq(p[1]) if isinstance(p[1], (str, bytes))
                 else np.asarray(p[1], np.uint8) for p in pairs]
        buckets = {}

        def q(x):
            return max(self.bucket_quantum,
                       -(-x // self.bucket_quantum) * self.bucket_quantum)
        for k, (ea, eb) in enumerate(zip(enc_a, enc_b)):
            key = (q(ea.shape[0]), q(eb.shape[0]))
            buckets.setdefault(key, []).append(k)
        return enc_a, enc_b, buckets

    def _arrays(self, enc_a, enc_b, idxs, key):
        bm, bn = key
        B = len(idxs)
        a = np.full((B, bm), PAD_A, np.uint8)
        b = np.full((B, bn), PAD_B, np.uint8)
        la = np.zeros((B,), np.int32)
        lb = np.zeros((B,), np.int32)
        for r, k in enumerate(idxs):
            la[r], lb[r] = enc_a[k].shape[0], enc_b[k].shape[0]
            a[r, : la[r]] = enc_a[k]
            b[r, : lb[r]] = enc_b[k]
        return a, b, la, lb

    def score_batch(self, pairs):
        """(scores, end_tables, end_js) for all pairs."""
        enc_a, enc_b, buckets = self._prep(pairs)
        scores = np.zeros(len(pairs), np.float32)
        tables = np.zeros(len(pairs), np.int32)
        ejs = np.zeros(len(pairs), np.int32)
        for key, idxs in buckets.items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s: s + self.max_batch]
                a, b, la, lb = self._arrays(enc_a, enc_b, chunk, key)
                out = None
                if self._use_pallas():
                    from cse305_parallel_sequence_alignment_tpu.models. \
                        batch import _pallas_fallback_warn
                    from cse305_parallel_sequence_alignment_tpu.ops. \
                        pallas_semiglobal import (
                            pallas_semiglobal_score_batch,
                        )
                    try:
                        out = pallas_semiglobal_score_batch(
                            a, b, la, lb, **self._kw())
                    except Exception as e:  # noqa: BLE001
                        _pallas_fallback_warn("semiglobal_score", e)
                if out is None:
                    out = np.asarray(semiglobal_score_batch(
                        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                        jnp.asarray(lb), **self._kw()))
                scores[chunk] = out[:, 0]
                tables[chunk] = out[:, 1].astype(np.int32)
                ejs[chunk] = out[:, 3].astype(np.int32)
        return scores, tables, ejs

    def align_batch(self, pairs):
        enc_a, enc_b, buckets = self._prep(pairs)
        results: list = [None] * len(pairs)
        for key, idxs in buckets.items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s: s + self.max_batch]
                a, b, la, lb = self._arrays(enc_a, enc_b, chunk, key)
                out = dirs = None
                pair_axis, layout = 0, "skew"
                if self._use_pallas():
                    # fused row-sweep dirs kernel (ROW layout, on-device)
                    from cse305_parallel_sequence_alignment_tpu.models. \
                        batch import _pallas_fallback_warn
                    from cse305_parallel_sequence_alignment_tpu.ops. \
                        pallas_semiglobal import (
                            pallas_semiglobal_dirs_batch,
                        )
                    try:
                        # perm=True: permuted lane layout (round 5);
                        # the walk maps columns via perm_tn
                        out, dirs = pallas_semiglobal_dirs_batch(
                            a, b, la, lb, device_dirs=True,
                            with_runs=True, perm=True, **self._kw())
                        pair_axis, layout = 1, "row"
                    except Exception as e:  # noqa: BLE001
                        _pallas_fallback_warn("semiglobal_dirs", e)
                if out is None:
                    out, dirs = semiglobal_dirs_batch(
                        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                        jnp.asarray(lb), **self._kw())
                    out = np.asarray(out)
                import jax
                if jax.default_backend() != "cpu" or layout == "row":
                    # keep dirs on-device; the walk happens there
                    # (slow device->host link, see ops/device_walk.py)
                    from cse305_parallel_sequence_alignment_tpu.ops. \
                        device_walk import walk_semiglobal_batch_device
                    ptn = (dirs.shape[2] // 128
                           if layout == "row" and dirs.shape[2] > 128
                           else 0)
                    chains = walk_semiglobal_batch_device(
                        dirs, out[:, 1].astype(np.int64),
                        out[:, 2].astype(np.int64),
                        out[:, 3].astype(np.int64), pair_axis=pair_axis,
                        layout=layout, perm_tn=ptn)
                else:
                    dirs = np.asarray(dirs)
                    chains = [traceback_semiglobal_from_dirs(
                        dirs[r], int(out[r, 1]), int(out[r, 2]),
                        int(out[r, 3]), layout="skew")
                        for r in range(len(chunk))]
                for r, k in enumerate(chunk):
                    t = int(out[r, 1])
                    ei, ej = int(out[r, 2]), int(out[r, 3])
                    chain = chains[r]
                    bcols = [j for (_, j, tt) in chain if tt in (1, 2)]
                    results[k] = SemiGlobalResult(
                        score=float(out[r, 0]), chain=chain,
                        cigar=chain_to_cigar(chain),
                        cigar_extended=chain_to_cigar_extended(
                            enc_a[k], enc_b[k], chain),
                        target_span=(bcols[0], bcols[-1]) if bcols
                        else (0, 0),
                        end_table=t)
        return results
