"""Bucketed batched overlap (dovetail) aligner + serial oracle.

Detects suffix(A)-vs-prefix(B) / prefix(A)-vs-suffix(B) overlaps with
free outer ends — the read-overlap primitive. Device fill ops/overlap.py,
walk ops.traceback.traceback_overlap_from_dirs, CIGARs ops/cigar.py.
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
)
from cse305_parallel_sequence_alignment_tpu.ops.overlap import (
    overlap_dirs_batch,
    overlap_score_batch,
)
from cse305_parallel_sequence_alignment_tpu.ops.traceback import (
    traceback_overlap_from_dirs,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import PAD_A, PAD_B

OVERLAP_PARAMS = ScoringParams(g=1.0, h=2.0, match=1.0, mismatch=-1.0)


def ov_oracle_tables(a, b, params=OVERLAP_PARAMS):
    """Serial overlap tables: T1 zero on row 0 AND column 0."""
    a = encode_seq(a) if isinstance(a, (str, bytes)) else np.asarray(a)
    b = encode_seq(b) if isinstance(b, (str, bytes)) else np.asarray(b)
    m, n = len(a), len(b)
    g, h, match, mismatch = params.astuple()
    T1 = np.full((m + 1, n + 1), NEG_INF, np.float32)
    T2 = np.full((m + 1, n + 1), NEG_INF, np.float32)
    T3 = np.full((m + 1, n + 1), NEG_INF, np.float32)
    T1[0, :] = 0.0
    T1[:, 0] = 0.0
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


def ov_oracle_best(a, b, params=OVERLAP_PARAMS):
    """(score, table, end_i, end_j): best over last row or column;
    tie order T1 >= T2 >= T3, then earliest anti-diagonal, then smallest
    column (matches the wavefront)."""
    T1, T2, T3 = ov_oracle_tables(a, b, params)
    m, n = T1.shape[0] - 1, T1.shape[1] - 1
    best, bt, bi, bj = float(NEG_INF), 1, 0, 0
    by_diag = {}
    for j in range(1, n + 1):
        for i in range(1, m + 1):
            if i == m or j == n:
                by_diag.setdefault(i + j, []).append((i, j))
    # per anti-diagonal: table-major (T1 >= T2 >= T3), then smallest j —
    # exactly the wavefront's update rule
    for d in sorted(by_diag):
        for t, T in ((1, T1), (2, T2), (3, T3)):
            for (i, j) in sorted(by_diag[d], key=lambda ij: ij[1]):
                if T[i, j] > best:
                    best, bt, bi, bj = float(T[i, j]), t, i, j
    return best, bt, bi, bj


@dataclasses.dataclass
class OverlapResult:
    score: float
    chain: list
    cigar: str
    # spans of the aligned cores (1-based inclusive)
    a_span: tuple
    b_span: tuple
    end_table: int


@dataclasses.dataclass
class OverlapBatchAligner:
    params: ScoringParams = OVERLAP_PARAMS
    bucket_quantum: int = 128
    max_batch: int = 512

    def _kw(self):
        g, h, match, mismatch = self.params.astuple()
        return dict(g=g, h=h, match=match, mismatch=mismatch)

    def _prep(self, pairs):
        enc_a = [encode_seq(p[0]) if isinstance(p[0], (str, bytes))
                 else np.asarray(p[0], np.uint8) for p in pairs]
        enc_b = [encode_seq(p[1]) if isinstance(p[1], (str, bytes))
                 else np.asarray(p[1], np.uint8) for p in pairs]
        q = self.bucket_quantum
        buckets = {}
        for k, (ea, eb) in enumerate(zip(enc_a, enc_b)):
            key = (max(q, -(-ea.shape[0] // q) * q),
                   max(q, -(-eb.shape[0] // q) * q))
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
        """(scores, end_tables, end_is, end_js)."""
        enc_a, enc_b, buckets = self._prep(pairs)
        scores = np.zeros(len(pairs), np.float32)
        tables = np.zeros(len(pairs), np.int32)
        eis = np.zeros(len(pairs), np.int32)
        ejs = np.zeros(len(pairs), np.int32)
        for key, idxs in buckets.items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s: s + self.max_batch]
                a, b, la, lb = self._arrays(enc_a, enc_b, chunk, key)
                out = np.asarray(overlap_score_batch(
                    jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                    jnp.asarray(lb), **self._kw()))
                scores[chunk] = out[:, 0]
                tables[chunk] = out[:, 1].astype(np.int32)
                eis[chunk] = out[:, 2].astype(np.int32)
                ejs[chunk] = out[:, 3].astype(np.int32)
        return scores, tables, eis, ejs

    backend: str = "auto"

    def _use_pallas(self):
        if self.backend == "pallas":
            return True
        if self.backend == "wavefront":
            return False
        import jax
        return jax.default_backend() == "tpu"

    def align_batch(self, pairs):
        enc_a, enc_b, buckets = self._prep(pairs)
        results: list = [None] * len(pairs)
        for key, idxs in buckets.items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s: s + self.max_batch]
                a, b, la, lb = self._arrays(enc_a, enc_b, chunk, key)
                out = dirs = None
                layout = "skew"
                if self._use_pallas():
                    # fused row-dirs Pallas kernel + on-device walk —
                    # the same structure as the global/semiglobal/banded
                    # fast paths (ops/pallas_overlap.py)
                    try:
                        from cse305_parallel_sequence_alignment_tpu. \
                            ops.pallas_overlap import (
                                pallas_overlap_dirs_batch,
                            )
                        # perm=True: permuted lane layout (round 5)
                        out, dirs = pallas_overlap_dirs_batch(
                            a, b, la, lb, device_dirs=True,
                            with_runs=True, perm=True, **self._kw())
                        layout = "row"
                    except Exception:  # noqa: BLE001
                        out = dirs = None
                if out is None:
                    out, dirs = overlap_dirs_batch(
                        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                        jnp.asarray(lb), **self._kw())
                    out = np.asarray(out)
                import jax
                if jax.default_backend() != "cpu" or layout == "row":
                    # on-device walk (slow device->host link)
                    from cse305_parallel_sequence_alignment_tpu.ops. \
                        device_walk import walk_overlap_batch_device
                    ptn = (dirs.shape[2] // 128
                           if layout == "row" and dirs.shape[2] > 128
                           else 0)
                    chains = walk_overlap_batch_device(
                        dirs, out[:, 1].astype(np.int64),
                        out[:, 2].astype(np.int64),
                        out[:, 3].astype(np.int64),
                        pair_axis=0 if layout == "skew" else 1,
                        layout=layout, perm_tn=ptn)
                else:
                    dirs = np.asarray(dirs)
                    chains = [traceback_overlap_from_dirs(
                        dirs[r], int(out[r, 1]), int(out[r, 2]),
                        int(out[r, 3]), layout="skew")
                        for r in range(len(chunk))]
                for r, k in enumerate(chunk):
                    t, ei, ej = (int(out[r, 1]), int(out[r, 2]),
                                 int(out[r, 3]))
                    chain = chains[r]
                    arows = [i for (i, _, tt) in chain if tt in (1, 3)]
                    bcols = [j for (_, j, tt) in chain if tt in (1, 2)]
                    results[k] = OverlapResult(
                        score=float(out[r, 0]), chain=chain,
                        cigar=chain_to_cigar(chain),
                        a_span=(arows[0], arows[-1]) if arows else (0, 0),
                        b_span=(bcols[0], bcols[-1]) if bcols else (0, 0),
                        end_table=t)
        return results
