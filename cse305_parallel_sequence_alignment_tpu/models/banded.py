"""Banded global aligner: O(m*W) fill + band-coordinate traceback.

For pairs whose optimal path stays within the diagonal band (similar
sequences — the production fast path), with optional verification: when
the best path touches the band edge the result may be sub-optimal, so
``edge_safe`` reports whether the band bound is trustworthy.
"""

from __future__ import annotations

import dataclasses

from cse305_parallel_sequence_alignment_tpu.core import (
    AlignmentResult,
    ScoringParams,
    encode_seq,
)
from cse305_parallel_sequence_alignment_tpu.models.oracle import (
    format_alignment,
)
from cse305_parallel_sequence_alignment_tpu.ops.banded import (
    band_check,
    banded_dirs,
    banded_score,
)
from cse305_parallel_sequence_alignment_tpu.ops.traceback import (
    traceback_from_dirs,
)


@dataclasses.dataclass
class BandedAligner:
    """Global affine-gap aligner restricted to |i - j + (w_hi-w_lo)/..|
    band: j in [i - w_lo, i + w_hi].

    Exact whenever the optimal unrestricted path stays inside the band
    (guaranteed if w_lo/w_hi exceed the maximum gap run, e.g. both >=
    |m - n| + max_indels). ``align`` also reports ``edge_touched``: True
    when the traceback touched the band boundary, i.e. widening the band
    could improve the score.
    """

    params: ScoringParams = ScoringParams()
    w_lo: int = 64
    w_hi: int = 64
    start_type: int = -1
    end_type: int = -1
    traceback_mode: str = "parity"  # "full" emits forced edge runs
    backend: str = "auto"  # "pallas" forces the fused dirs kernel

    def _use_pallas(self):
        if self.backend == "pallas":
            return True
        if self.backend == "wavefront":
            return False
        import jax
        return jax.default_backend() == "tpu"

    def score(self, a, b):
        a_enc = encode_seq(a) if isinstance(a, (str, bytes)) else a
        b_enc = encode_seq(b) if isinstance(b, (str, bytes)) else b
        g, h, match, mismatch = self.params.astuple()
        finals = banded_score(a_enc, b_enc, self.w_lo, self.w_hi, g=g,
                              h=h, match=match, mismatch=mismatch,
                              start_type=self.start_type)
        from cse305_parallel_sequence_alignment_tpu.core import (
            end_table_choice,
        )
        _, s = end_table_choice(float(finals[0]), float(finals[1]),
                                float(finals[2]), self.end_type,
                                self.params.h)
        return s

    def align(self, a, b):
        a_enc = encode_seq(a) if isinstance(a, (str, bytes)) else a
        b_enc = encode_seq(b) if isinstance(b, (str, bytes)) else b
        m, n = len(a_enc), len(b_enc)
        band_check(m, n, self.w_lo, self.w_hi)
        g, h, match, mismatch = self.params.astuple()
        chain = None
        if self._use_pallas():
            # fused band dirs kernel + on-device walk (the dirs matrix
            # never crosses the device->host link)
            import numpy as np

            from cse305_parallel_sequence_alignment_tpu.core import (
                end_table_choice,
            )
            from cse305_parallel_sequence_alignment_tpu.models.batch \
                import _pallas_fallback_warn
            from cse305_parallel_sequence_alignment_tpu.ops. \
                device_walk import walk_batch_device
            from cse305_parallel_sequence_alignment_tpu.ops. \
                pallas_banded import pallas_banded_dirs_batch
            try:
                # with_runs: uint16 band dirs — the RLE walk consumes a
                # whole diagonal run per dependent gather (round 5;
                # diagonal runs keep their band lane, so runs need no
                # lane shift in this layout)
                finals, dirs_dev = pallas_banded_dirs_batch(
                    a_enc[None, :], b_enc[None, :], np.array([m]),
                    np.array([n]), self.w_lo, self.w_hi, g=g, h=h,
                    match=match, mismatch=mismatch,
                    start_type=self.start_type, device_dirs=True,
                    with_runs=True)
                table, score = end_table_choice(
                    float(finals[0, 0]), float(finals[0, 1]),
                    float(finals[0, 2]), self.end_type, self.params.h)
                chain = walk_batch_device(
                    dirs_dev, np.array([m]), np.array([n]),
                    np.array([table]), mode=self.traceback_mode,
                    pair_axis=1, layout=("band", self.w_lo))[0]
            except Exception as e:  # noqa: BLE001
                _pallas_fallback_warn("banded_dirs", e)
        if chain is None:
            finals, dirs = banded_dirs(
                a_enc, b_enc, self.w_lo, self.w_hi, g=g, h=h, match=match,
                mismatch=mismatch, start_type=self.start_type)
            chain, table, score = traceback_from_dirs(
                dirs, finals, m, n, self.params.h, self.end_type,
                layout=("band", self.w_lo), mode=self.traceback_mode)
        row_a, row_b = format_alignment(bytes(a_enc), bytes(b_enc), chain)
        res = AlignmentResult(score=score, chain=chain, aligned_a=row_a,
                              aligned_b=row_b, end_table=table)
        res.edge_touched = any(
            (j - i) in (self.w_hi, -self.w_lo)
            for (i, j, t) in chain if t == 1)
        return res
