"""Bucketed many-pairs aligner: the throughput mode (reference P6).

The reference harness runs whole alignments on std::threads
(test_functions/testing.cpp:112-158). Here, pairs are length-bucketed
(static shapes for XLA), padded, and processed in lockstep by the batched
wavefront fill; the VPU parallelises across batch x diagonal. Bucketing is
the TPU-native replacement for the reference's omega work-estimate /
processor-assignment machinery (main_alignment.cpp:158-200): load balance
comes from static shape grouping instead of dynamic thread deals.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cse305_parallel_sequence_alignment_tpu.core import (
    AlignmentResult,
    ScoringParams,
    encode_seq,
)
from cse305_parallel_sequence_alignment_tpu.models.oracle import (
    format_alignment,
)
from cse305_parallel_sequence_alignment_tpu.ops.traceback import (
    traceback_from_dirs,
)
from cse305_parallel_sequence_alignment_tpu.ops.wavefront import (
    PAD_A,
    PAD_B,
    wavefront_dirs_batch,
    wavefront_score_batch,
)


_warned_fallback = set()


def _pallas_fallback_warn(kind, err):
    """Warn once per kind when a Pallas kernel fails and the engine falls
    back to the XLA wavefront path (still device-native, just un-fused)."""
    if kind not in _warned_fallback:
        _warned_fallback.add(kind)
        import sys
        print(f"[tpu-seqalign] pallas {kind} kernel unavailable "
              f"({type(err).__name__}: {err}); using XLA wavefront path",
              file=sys.stderr)


def _round_up(x, q):
    return max(q, -(-x // q) * q)


def _encode_many(seqs):
    return [encode_seq(s) if isinstance(s, (str, bytes)) else
            np.asarray(s, np.uint8) for s in seqs]


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nl", "block_b", "g", "h", "match",
                     "mismatch", "B", "max_steps", "k_steps",
                     "interpret", "k1", "perm"))
def _fused_fill_walk(a_pad, b_ext, lbmask, la_t, st_t, la_v, lb_v, en_v,
                     *, m, n, nl, block_b, g, h, match, mismatch, B,
                     max_steps, k_steps=8, interpret=False, k1=0,
                     perm=False):
    """One XLA program: rowdirs Pallas fill (with diagonal-run lengths)
    -> end-table choice -> on-device RLE walk. Dispatch latency (~25 ms
    through the evaluation tunnel) halves vs separate fill/walk
    programs, and the run-length walk consumes a whole diagonal run per
    dependent gather — the e2e floor round 2 measured at ~10 us/step
    amortizes over the run. Returns (entries (rounds_pad, B) uint8 ON
    DEVICE, rounds_used, tables, scores); the caller fetches only the
    used rounds (~steps/run_len bytes per pair)."""
    from cse305_parallel_sequence_alignment_tpu.ops.device_walk import (
        _walk_core_rle,
    )
    from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb import (
        _pallas_rowcb,
    )

    dirs16, fin = _pallas_rowcb(
        a_pad, b_ext, lbmask, la_t, st_t, m=m, n=n, nl=nl, g=g, h=h,
        match=match, mismatch=mismatch, k_steps=k_steps,
        block_b=block_b, interpret=interpret, want_dirs=True,
        with_runs=True, k1=k1, perm=perm, runs2=False)
    finals = fin[:B, :3]
    # end-table choice, per-pair dynamic end type (tie order
    # T1 >= T2 >= T3, gap-open refund for forced-into-gap ends)
    f1 = finals[:, 0]
    f2 = finals[:, 1] + jnp.where(en_v == -2, h, 0.0)
    f3 = finals[:, 2] + jnp.where(en_v == -3, h, 0.0)
    pick1 = (f1 >= f2) & (f1 >= f3)
    pick2 = ~pick1 & (f2 >= f3)
    tb_free = jnp.where(pick1, 1, jnp.where(pick2, 2, 3))
    sc_free = jnp.where(pick1, f1, jnp.where(pick2, f2, f3))
    forced = en_v > 0
    sc_forced = jnp.take_along_axis(
        finals, jnp.clip(en_v - 1, 0, 2)[:, None], axis=1)[:, 0]
    tb = jnp.where(forced, en_v, tb_free).astype(jnp.int32)
    sc = jnp.where(forced, sc_forced, sc_free)
    # The RLE walk measured ~7 ms at B=128 x 2 kb in round 5 (~98
    # dependent gather rounds) — no longer the e2e ceiling; the dirs
    # fill is. runs2 (run + first-gap-step fusion, cutting rounds to
    # ~63) was built, verified chain-exact, and measured NET NEGATIVE:
    # the walk saves only ~0.3 ms while the fill's 2 extra carry planes
    # cost ~1.5-2 ms per chunk (same-process A/B, /tmp round-5 probes;
    # see ops/pallas_rowcb.py runs2). It stays available but off. The
    # Pallas scalar-walk kernel (ops/pallas_walk.py) is likewise slower
    # (per-round scalar-core overhead) — XLA walk is default.
    entries, used = _walk_core_rle(dirs16, la_v, lb_v, tb,
                                   max_steps=max_steps, pair_axis=1,
                                   perm_cb=perm, runs2=False)
    # capped prefix ships WITH the scores in one host transfer; the
    # full buffer stays on device for the rare used > cap overflow
    cap = min(entries.shape[0], max(256, max_steps // 16))
    return entries, entries[:cap], used, tb, sc


def _end_choice_vec(finals, end_type, h):
    """Vectorised end-table choice (tie order T1>=T2>=T3, gap-open refund)."""
    t1 = finals[:, 0]
    t2 = finals[:, 1] + (h if end_type == -2 else 0.0)
    t3 = finals[:, 2] + (h if end_type == -3 else 0.0)
    if end_type > 0:
        table = np.full(len(finals), end_type, np.int32)
        score = finals[:, end_type - 1]
        return table, score
    pick1 = (t1 >= t2) & (t1 >= t3)
    pick2 = ~pick1 & (t2 >= t3)
    table = np.where(pick1, 1, np.where(pick2, 2, 3)).astype(np.int32)
    score = np.where(pick1, t1, np.where(pick2, t2, t3))
    return table, score


@dataclasses.dataclass
class BatchAligner:
    """Aligns many pairs at once with length bucketing.

    ``bucket_quantum`` controls padded-shape granularity (compilation cache
    trades against padding waste). ``max_batch`` caps device batch size per
    launch (memory control for the direction matrices). ``backend`` picks
    the fill kernel: "auto" uses the Pallas kernels on TPU and the pure-JAX
    wavefront elsewhere.
    """

    params: ScoringParams = ScoringParams()
    start_type: int = -1
    end_type: int = -1
    parity_swap: bool = True
    bucket_quantum: int = 128
    max_batch: int = 512
    backend: str = "auto"
    # cap on a single launch's direction-matrix footprint (bytes);
    # align_batch shrinks its chunk size to fit
    dirs_budget: int = 2 << 30
    # optional core.SubstitutionMatrix: full KxK scoring instead of
    # match/mismatch; sequences are alphabet-encoded and the fill uses
    # the matrix-lookup wavefront kernels
    matrix: object = None
    # buckets longer than this route to the column-chunked long fill
    # (whole-row kernels run out of VMEM past ~16 k columns)
    long_threshold: int = 16384

    def _use_pallas(self):
        if self.matrix is not None:
            return False  # matrix path: wavefront kernels
        if self.backend == "pallas":
            return True
        if self.backend == "wavefront":
            return False
        import jax
        return jax.default_backend() == "tpu"

    def _fused_ok(self):
        """The fused rowcb fill+walk path serves BOTH scoring modes
        (match/mismatch and substitution matrix)."""
        if self.backend == "wavefront":
            return False
        if self.backend == "pallas":
            return True
        import jax
        return jax.default_backend() == "tpu"

    def _matrix_kw(self):
        return dict(g=self.params.g, h=self.params.h,
                    start_type=self.start_type,
                    pad_code=self.matrix.pad_code)

    def _finals(self, a, b, la, lb):
        """(B, 3) final-cell values for a padded bucket."""
        if self.backend == "pallas_rowscan":
            from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill \
                import pallas_rowscan_score_batch
            return pallas_rowscan_score_batch(a, b, la, lb, **self._kw())
        if self.matrix is not None:
            import jax
            if self.backend != "wavefront" and \
                    jax.default_backend() == "tpu":
                from cse305_parallel_sequence_alignment_tpu.ops. \
                    pallas_fill import pallas_submat_score_batch
                try:
                    return pallas_submat_score_batch(
                        a, b, la, lb, self.matrix.table(),
                        g=self.params.g, h=self.params.h,
                        start_type=self.start_type)
                except Exception as e:  # noqa: BLE001
                    _pallas_fallback_warn("submat", e)
            from cse305_parallel_sequence_alignment_tpu.ops.wavefront \
                import wavefront_score_batch_matrix
            return np.asarray(wavefront_score_batch_matrix(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                jnp.asarray(lb), jnp.asarray(self.matrix.table()),
                **self._matrix_kw()))
        if self._use_pallas():
            if max(a.shape[1], b.shape[1]) > self.long_threshold:
                # beyond the whole-row kernels' VMEM reach: the
                # column-chunked fill handles any length
                from cse305_parallel_sequence_alignment_tpu.ops. \
                    pallas_longrow import pallas_long_score_batch
                try:
                    return pallas_long_score_batch(a, b, la, lb,
                                                   **self._kw())
                except Exception as e:  # noqa: BLE001
                    _pallas_fallback_warn("longrow", e)
            from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill \
                import pallas_score_batch
            try:
                return pallas_score_batch(a, b, la, lb, **self._kw())
            except Exception as e:  # noqa: BLE001 - kernel compile issues
                _pallas_fallback_warn("score", e)
        return np.asarray(wavefront_score_batch(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
            jnp.asarray(lb), **self._kw()))

    def _dirs(self, a, b, la, lb):
        """(finals (B,3), dirs array, pair_axis, layout) for a padded
        bucket; pair_axis 0 = pair-major, 1 = row-major arrays; layout
        "skew" = dirs row i+j holds cell (i, j), "row" = dirs row i
        holds cell (i, j)."""
        if self.matrix is not None:
            import jax

            from cse305_parallel_sequence_alignment_tpu.ops.wavefront \
                import wavefront_dirs_batch_matrix
            finals, dirs = wavefront_dirs_batch_matrix(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
                jnp.asarray(lb), jnp.asarray(self.matrix.table()),
                **self._matrix_kw())
            if jax.default_backend() != "cpu":
                return np.asarray(finals), dirs, 0, "skew"  # device walk
            return np.asarray(finals), np.asarray(dirs), 0, "skew"
        if self._use_pallas():
            # keep the (large) dirs array ON DEVICE: the traceback walks
            # there too (ops/device_walk.py) and only 2-bit op codes come
            # back — device->host bandwidth is the bottleneck for full
            # alignments. The row-layout kernel is the fast path (one
            # prefix-max row sweep instead of a ramp-wasted diagonal
            # sweep, and half the dirs footprint).
            from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill \
                import pallas_dirs_batch, pallas_rowdirs_batch
            try:
                finals, dirs = pallas_rowdirs_batch(
                    a, b, la, lb, device_dirs=True, **self._kw())
                return np.asarray(finals), dirs, 1, "row"
            except Exception as e:  # noqa: BLE001
                _pallas_fallback_warn("rowdirs", e)
            try:
                finals, dirs = pallas_dirs_batch(
                    a, b, la, lb, device_dirs=True, **self._kw())
                return np.asarray(finals), dirs, 1, "skew"
            except Exception as e:  # noqa: BLE001
                _pallas_fallback_warn("dirs", e)
        finals, dirs = wavefront_dirs_batch(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(la),
            jnp.asarray(lb), **self._kw())
        return np.asarray(finals), np.asarray(dirs), 0, "skew"

    def _kw(self):
        g, h, match, mismatch = self.params.astuple()
        return dict(g=g, h=h, match=match, mismatch=mismatch,
                    start_type=self.start_type)

    def _prep(self, pairs):
        enc_a = _encode_many([p[0] for p in pairs])
        enc_b = _encode_many([p[1] for p in pairs])
        if self.parity_swap:
            for k in range(len(pairs)):
                if enc_a[k].shape[0] > enc_b[k].shape[0]:
                    enc_a[k], enc_b[k] = enc_b[k], enc_a[k]
        buckets = {}
        for k, (ea, eb) in enumerate(zip(enc_a, enc_b)):
            key = (_round_up(ea.shape[0], self.bucket_quantum),
                   _round_up(eb.shape[0], self.bucket_quantum))
            buckets.setdefault(key, []).append(k)
        return enc_a, enc_b, buckets

    def _bucket_arrays(self, enc_a, enc_b, idxs, key):
        bm, bn = key
        B = len(idxs)
        if self.matrix is None:
            pa, pb = PAD_A, PAD_B
        else:  # matrix path: device arrays hold alphabet codes
            pa = pb = np.uint8(self.matrix.pad_code)
        a = np.full((B, bm), pa, np.uint8)
        b = np.full((B, bn), pb, np.uint8)
        la = np.zeros((B,), np.int32)
        lb = np.zeros((B,), np.int32)
        for r, k in enumerate(idxs):
            ra, rb = enc_a[k], enc_b[k]
            if self.matrix is not None:
                ra = self.matrix.encode(bytes(ra))
                rb = self.matrix.encode(bytes(rb))
            la[r] = ra.shape[0]
            lb[r] = rb.shape[0]
            a[r, : la[r]] = ra
            b[r, : lb[r]] = rb
        return a, b, la, lb

    def score_batch(self, pairs):
        """Scores for a list of (a, b) pairs. Returns (scores, end_tables).

        ``self.last_launches`` records the device launches of the most
        recent call as (padded_m, padded_n, batch) tuples — the harness
        CSVs' sidecar metadata (per-launch batch size attribution)."""
        enc_a, enc_b, buckets = self._prep(pairs)
        scores = np.zeros(len(pairs), np.float32)
        tables = np.zeros(len(pairs), np.int32)
        self.last_launches = []
        for key, idxs in buckets.items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s: s + self.max_batch]
                self.last_launches.append((key[0], key[1], len(chunk)))
                a, b, la, lb = self._bucket_arrays(enc_a, enc_b, chunk, key)
                finals = self._finals(a, b, la, lb)
                tb, sc = _end_choice_vec(finals, self.end_type,
                                         self.params.h)
                scores[chunk] = sc
                tables[chunk] = tb
        return scores, tables

    def align_batch(self, pairs, offsets=None, traceback_mode="parity",
                    start_types=None, end_types=None):
        """Full alignments (device fill + host traceback) for all pairs.

        ``offsets``: optional per-pair (id_a, id_b) global coordinate
        offsets (partitioned segment solves). ``traceback_mode``: see
        ops/traceback.py ("parity" = reference B1; "full" = emit edge
        runs, required when stitching segments). ``start_types``/
        ``end_types``: optional per-pair boundary types overriding the
        aligner's scalars — mixed-type batches (the partition layer's
        anchored segments) run as ONE device dispatch on the fused
        path; non-fused fallbacks subgroup by type."""
        enc_a, enc_b, buckets = self._prep(pairs)
        results: list = [None] * len(pairs)
        pending: list = []
        for key, idxs in buckets.items():
            bm, bn = key
            if self._fused_ok():
                # row-layout uint16 dirs (codes + run lengths):
                # (m+1 rounded to k_steps) x nl x 2 bytes
                per_pair = 2 * (bm + 16) * (-(-(bn + 1) // 128) * 128)
            else:  # skew-T layout
                per_pair = (bm + bn + 1) * (bn + 1)
            step = max(1, min(self.max_batch, self.dirs_budget // per_pair))
            if len(idxs) >= 64 and step >= len(idxs):
                # split big single-chunk batches in two so the second
                # chunk's device time hides the first's host replay +
                # render (25% more pairs/s in the paired chip A/B)
                step = -(-len(idxs) // 2)
            elif step < len(idxs):
                # equalize chunk sizes: a ragged tail (e.g. 239+17 at
                # the default budget) pays a full walk + sync for a
                # sliver of work
                nchunks = -(-len(idxs) // step)
                step = -(-len(idxs) // nchunks)
            for s in range(0, len(idxs), step):
                chunk = idxs[s: s + step]
                a, b, la, lb = self._bucket_arrays(enc_a, enc_b, chunk, key)
                st_vec = en_vec = None
                if start_types is not None:
                    st_vec = np.asarray(
                        [start_types[k] for k in chunk], np.int32)
                if end_types is not None:
                    en_vec = np.asarray(
                        [end_types[k] for k in chunk], np.int32)
                item = None
                if self._fused_ok():
                    # single-dispatch path: fill + end choice + walk in
                    # ONE compiled program, ONE host round trip with
                    # run-length op codes — dispatch latency and
                    # device->host bytes both first-order through the
                    # evaluation tunnel (~25 ms/dispatch, ~9 MB/s)
                    try:
                        handles = self._dispatch_fused(
                            a, b, la, lb, st_vec, en_vec)
                        item = ("fused", chunk, la, lb, handles)
                    except Exception as e:  # noqa: BLE001
                        _pallas_fallback_warn("fused_rowdirs", e)
                if item is None:
                    chains, arrays, tables, scores = \
                        self._dirs_walk_grouped(
                            a, b, la, lb, st_vec, en_vec,
                            traceback_mode, offsets, chunk)
                    item = ("done", chunk, chains, arrays, tables, scores)
                # two chunks in flight: the device fills/walks chunk c+1
                # while the host replays + renders chunk c
                pending.append(item)
                while len(pending) > 1:
                    self._emit_chunk(pending.pop(0), enc_a, enc_b,
                                     results, offsets, traceback_mode)
        while pending:
            self._emit_chunk(pending.pop(0), enc_a, enc_b, results,
                             offsets, traceback_mode)
        return results

    def _dirs_walk_grouped(self, a, b, la, lb, st_vec, en_vec, mode,
                           offsets, chunk):
        """Non-fused fill + walk, subgrouped by boundary type when
        per-pair type vectors are present (the XLA dirs kernels key
        start_type statically)."""
        if st_vec is None and en_vec is None:
            finals, dirs, pair_axis, layout = self._dirs(a, b, la, lb)
            tables, scores = _end_choice_vec(
                finals, self.end_type, self.params.h)
            chains, arrays = self._walk_chunk(
                dirs, pair_axis, layout, la, lb, tables, mode,
                offsets, chunk)
            return chains, arrays, tables, scores
        B = len(chunk)
        sts = st_vec if st_vec is not None else \
            np.full(B, self.start_type, np.int32)
        ens = en_vec if en_vec is not None else \
            np.full(B, self.end_type, np.int32)
        chains = [None] * B
        tables = np.zeros(B, np.int32)
        scores = np.zeros(B, np.float32)
        for (st, en) in sorted({(int(s_), int(e_))
                                for s_, e_ in zip(sts, ens)}):
            rows = [r for r in range(B)
                    if sts[r] == st and ens[r] == en]
            sub = dataclasses.replace(self, start_type=st, end_type=en)
            finals, dirs, pair_axis, layout = sub._dirs(
                a[rows], b[rows], la[rows], lb[rows])
            tb, sc = _end_choice_vec(finals, en, self.params.h)
            sub_chunk = [chunk[r] for r in rows]
            ch, _ = sub._walk_chunk(dirs, pair_axis, layout, la[rows],
                                    lb[rows], tb, mode, offsets,
                                    sub_chunk)
            for w, r in enumerate(rows):
                chains[r] = ch[w]
                tables[r] = tb[w]
                scores[r] = sc[w]
        return chains, None, tables, scores

    def _emit_chunk(self, item, enc_a, enc_b, results, offsets, mode):
        if item[0] == "fused":
            _, chunk, la, lb, handles = item
            chains, arrays, tables, scores = self._collect_fused(
                handles, la, lb, mode, offsets, chunk)
        else:
            _, chunk, chains, arrays, tables, scores = item
        for r, k in enumerate(chunk):
            chain = chains[r]
            if offsets is not None:
                # chain is in global coordinates; the caller renders
                # the stitched result itself
                row_a = row_b = None
            else:
                row_a = row_b = None
                if arrays is not None:
                    from cse305_parallel_sequence_alignment_tpu.native \
                        import walker
                    tt, ii, jj, lens = arrays
                    L = int(lens[r])
                    out = walker.render(enc_a[k], enc_b[k], tt[r, :L],
                                        ii[r, :L], jj[r, :L])
                    if out is not None:
                        row_a, row_b = out
                if row_a is None:
                    row_a, row_b = format_alignment(
                        bytes(enc_a[k]), bytes(enc_b[k]), chain)
            results[k] = AlignmentResult(
                score=float(scores[r]), chain=chain,
                aligned_a=row_a, aligned_b=row_b,
                end_table=int(tables[r]))

    def _dispatch_fused(self, a, b, la, lb, st_vec=None, en_vec=None):
        """Queue fill + end choice + walk as ONE compiled dispatch;
        returns device handles (RLE entries, rounds, tables, scores)
        without synchronizing — align_batch keeps two chunks in flight.
        ``st_vec``/``en_vec``: optional per-pair boundary types (the
        partition layer's mixed-type segment batches); default = the
        aligner's scalar types."""
        import jax.numpy as jnp

        from cse305_parallel_sequence_alignment_tpu.ops.pallas_fill \
            import _default_interpret
        from cse305_parallel_sequence_alignment_tpu.ops.pallas_rowcb \
            import rowcb_prep

        # k_steps=2 shrinks the double-buffered uint16 dirs block so
        # block_b stays 64 at 2 kb buckets — the issue-limited VPU runs
        # ~1.6x faster on (64, 1024) ops than (32, 1024) (measured)
        if self.matrix is not None:
            # substitution-matrix mode through the SAME fused program
            # (query-profile f(), VERDICT r3 missing #3); a/b already
            # hold alphabet codes from _bucket_arrays
            from cse305_parallel_sequence_alignment_tpu.ops. \
                pallas_rowcb import rowcb_mat_prep
            args, meta = rowcb_mat_prep(
                a, b, la, lb, self.matrix.table(), self.start_type,
                carries=11, perm=True)
            k1 = meta.pop("k1")
        else:
            args, meta = rowcb_prep(a, b, la, lb, self.start_type,
                                    carries=11, perm=True)
            k1 = 0
        B = la.shape[0]
        args, st_t = args[:4], args[4]
        if st_vec is not None:
            st_t[:B] = np.asarray(st_vec, np.int32)[:, None]
        en_v = np.full((B,), int(self.end_type), np.int32)
        if en_vec is not None:
            en_v[:] = np.asarray(en_vec, np.int32)
        max_steps = int(la.max(initial=0) + lb.max(initial=0)) + 1
        g, h, match, mismatch = self.params.astuple()
        entries, ent_cap, used, tables, scores = _fused_fill_walk(
            *args, st_t, jnp.asarray(la, jnp.int32),
            jnp.asarray(lb, jnp.int32), jnp.asarray(en_v),
            m=meta["m"], n=meta["n"], nl=meta["nl"],
            block_b=meta["block_b"], g=g, h=h, match=match,
            mismatch=mismatch, B=B, max_steps=max_steps,
            k_steps=2, interpret=_default_interpret(None), k1=k1,
            perm=meta["perm"])
        # start device->host copies NOW: by collect time (the pipeline
        # dispatches the next chunk first) the bytes are host-side and
        # the fetch costs ~0 round trips
        for x in (ent_cap, used, tables, scores):
            try:
                x.copy_to_host_async()
            except Exception:  # noqa: BLE001 - interpret-mode arrays
                break
        return entries, ent_cap, used, tables, scores, max_steps

    def _collect_fused(self, handles, la, lb, mode, offsets, chunk):
        """Fetch a dispatched chunk (scores + the USED rounds of the
        RLE walk entries only), expand the run-length codes, replay,
        and wrap chains as LazyChain views (tuple building measured
        46 ms of a 226 ms 128x2kb batch and most consumers never touch
        them)."""
        import jax

        from cse305_parallel_sequence_alignment_tpu.core import LazyChain
        from cse305_parallel_sequence_alignment_tpu.ops.device_walk \
            import expand_rle_ops, replay_ops

        entries_d, ent_cap_d, used_d, tables_d, scores_d, max_steps = \
            handles
        ent, used, tables, scores = jax.device_get(
            (ent_cap_d, used_d, tables_d, scores_d))
        B = len(chunk)
        if ent.dtype == np.int32:
            # pallas-walk layout: pair-major (B, cap) int32 entries
            if int(used) > ent.shape[1]:
                rpad = min(entries_d.shape[1],
                           -(-int(used) // 256) * 256)
                ent = jax.device_get(entries_d[:, :rpad])
            ent_b = ent[:B].astype(np.uint16)
        else:
            if int(used) > ent.shape[0]:
                # overflow past the shipped cap (atypical paths): fetch
                # the full used prefix in a second round trip
                rounds_cap = entries_d.shape[0]
                rpad = min(rounds_cap, -(-int(used) // 256) * 256)
                ent = jax.device_get(entries_d[:rpad])
            ent_b = ent.T[:B]
        # runs2 fused streams leave the second slot of non-gap rounds
        # empty: push zeros to the tail (stable) so the replays, which
        # treat 0 as end-of-stream, see a dense prefix
        z = ent_b == 0
        if z[:, :-1].any():
            order = np.argsort(z, axis=1, kind="stable")
            ent_b = np.take_along_axis(ent_b, order, axis=1)
        from cse305_parallel_sequence_alignment_tpu.native import walker
        out = walker.replay_rle(ent_b, np.asarray(la, np.int64),
                                np.asarray(lb, np.int64),
                                tables.astype(np.int32), mode,
                                offsets=offsets, chunk=chunk)
        if out is not None:  # thread-parallel C++ replay
            tt, ii, jj, lens = out
        else:
            ops = expand_rle_ops(ent_b, max_steps)
            tt, ii, jj, lens = replay_ops(
                ops[:, :max_steps], np.asarray(la, np.int64),
                np.asarray(lb, np.int64), tables.astype(np.int64),
                mode=mode, offsets=offsets, chunk=chunk)
        # per-row copies so a kept chain doesn't pin the (B, cap) bases
        chains = [LazyChain(tt[r, : lens[r]].copy(),
                            ii[r, : lens[r]].copy(),
                            jj[r, : lens[r]].copy())
                  for r in range(B)]
        arrays = (tt, ii, jj, lens) if offsets is None else None
        return chains, arrays, tables, scores.astype(np.float32)

    def _walk_chunk(self, dirs, pair_axis, layout, la, lb, tables, mode,
                    offsets, chunk):
        """(chains, render_arrays) for every pair of one device chunk:
        on-device walk when the dirs array lives on the accelerator
        (2-bit codes come back instead of the matrix), thread-parallel
        native walk when libtsa is built, per-pair Python walk otherwise
        (identical output — tests assert equality). ``render_arrays`` is
        (tt, ii, jj, lens) in LOCAL coordinates for the native renderer,
        or None (only populated when offsets is None)."""
        if not isinstance(dirs, np.ndarray):  # device-resident
            from cse305_parallel_sequence_alignment_tpu.ops.device_walk \
                import _run_walk, replay_ops
            ops, la64, lb64, t64 = _run_walk(dirs, la, lb, tables,
                                             pair_axis=pair_axis,
                                             layout=layout)
            tt, ii, jj, lens = replay_ops(ops, la64, lb64, t64, mode=mode,
                                          offsets=offsets, chunk=chunk)
            chains = [list(zip(ii[r, : lens[r]].tolist(),
                               jj[r, : lens[r]].tolist(),
                               tt[r, : lens[r]].tolist()))
                      for r in range(len(chunk))]
            arrays = (tt, ii, jj, lens) if offsets is None else None
            return chains, arrays
        from cse305_parallel_sequence_alignment_tpu.native import walker
        out = walker.walk_batch(dirs, pair_axis, la, lb, tables,
                                layout="skew", mode=mode)
        chains = []
        if out is not None:
            tt, ii, jj, lens = out
            for r, k in enumerate(chunk):
                L = int(lens[r])
                t_r = tt[r, :L]
                i_r, j_r = ii[r, :L].copy(), jj[r, :L].copy()
                if offsets is not None:
                    id_a, id_b = offsets[k]
                    # gap points keep their stored zero (quirk B2)
                    i_r[i_r != 0] += id_a
                    j_r[j_r != 0] += id_b
                chains.append(list(zip(i_r.tolist(), j_r.tolist(),
                                       t_r.tolist())))
            return chains, (out if offsets is None else None)
        for r, k in enumerate(chunk):
            id_a, id_b = offsets[k] if offsets else (0, 0)
            d_r = dirs[r] if pair_axis == 0 else dirs[:, r, :]
            chain, _, _ = traceback_from_dirs(
                d_r, np.full(3, 0.0), int(la[r]), int(lb[r]),
                self.params.h, tables[r], id_a=id_a, id_b=id_b,
                layout="skew", mode=mode)
            chains.append(chain)
        return chains, None
