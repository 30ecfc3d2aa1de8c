"""Phase-level profile of the full-dataset-pair partition alignment.

Times each phase of PartitionedAligner.align on the two longest
gene_sequences_test sequences (97,409 x 97,403 nt): bisection crossing
search (per level, per fill), segment batch solves, stitch + score +
render. Run on the real chip:

    timeout 900 python scripts/partition_profile.py [p]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from cse305_parallel_sequence_alignment_tpu.core import ScoringParams, encode_seq
from cse305_parallel_sequence_alignment_tpu.models.batch import BatchAligner
from cse305_parallel_sequence_alignment_tpu.models.oracle import format_alignment
from cse305_parallel_sequence_alignment_tpu.parallel import partition as P
from cse305_parallel_sequence_alignment_tpu.utils.fasta import (
    read_and_store_sequences,
)


def main():
    reps = 2 if "--twice" in sys.argv else 1
    for rep in range(reps):
        print(f"==== pass {rep} ====")
        run_once()


def run_once():
    p_arg = int(sys.argv[1]) if len(sys.argv) > 1 and \
        sys.argv[1].isdigit() else 0
    names, seqs = read_and_store_sequences(
        "/root/reference/gene_sequences_test")
    order = sorted(range(len(seqs)), key=lambda k: -len(seqs[k]))
    a, b = seqs[order[0]], seqs[order[1]]
    params = ScoringParams()
    a_enc, b_enc = encode_seq(a), encode_seq(b)
    if a_enc.shape[0] > b_enc.shape[0]:
        a_enc, b_enc = b_enc, a_enc
    m, n = a_enc.shape[0], b_enc.shape[0]
    print(f"pair {m} x {n}")

    al = P.PartitionedAligner(params=params, p=p_arg, fill_backend="auto")
    p = al._pick_p(m, n)
    print(f"p = {p}")
    lastrow_fn = al._lastrow_fn(m, n)

    fills = []
    orig = P.crossing_on_row

    def timed_crossing(sa, sb, i_mid, prm, st, en, lastrow_fn=None):
        t0 = time.perf_counter()
        out = orig(sa, sb, i_mid, prm, st, en, lastrow_fn=lastrow_fn)
        dt = time.perf_counter() - t0
        fills.append((sa.shape[0], sb.shape[0], i_mid, dt))
        print(f"  crossing m={sa.shape[0]} n={sb.shape[0]} i_mid={i_mid} "
              f"-> {dt:.2f}s ({2 * i_mid * sb.shape[0] / dt / 1e9:.2f}+rev GC)")
        return out

    P.crossing_on_row = timed_crossing
    crossings_fn = al._crossings_fn(m, n)
    if crossings_fn is not None:
        inner = crossings_fn

        def crossings_fn(tasks):
            t0 = time.perf_counter()
            out = inner(tasks)
            dt = time.perf_counter() - t0
            cells = sum(sa.shape[0] * sb.shape[0]
                        for sa, sb, _, _, _ in tasks)
            print(f"  level x{len(tasks)} crossings "
                  f"(max m={max(t[2] for t in tasks)}, "
                  f"max n={max(len(t[1]) for t in tasks)}) -> {dt:.2f}s "
                  f"({cells / dt / 1e9:.2f} GC eff)")
            fills.append(dt)
            return out

    t0 = time.perf_counter()
    points = P.balanced_partition(a_enc, b_enc, p, params,
                                  lastrow_fn=lastrow_fn,
                                  crossings_fn=crossings_fn)
    t_part = time.perf_counter() - t0
    P.crossing_on_row = orig
    print(f"bisection total: {t_part:.2f}s  ({len(fills)} rounds)")

    # segment solves (mirror align())
    segments = []
    for k in range(len(points) - 1):
        (i0, j0, t0_), (i1, j1, t1_) = points[k], points[k + 1]
        st = t0_ if k > 0 else -1
        en = -t1_ if k < len(points) - 2 else -1
        segments.append((k, i0, j0, a_enc[i0:i1], b_enc[j0:j1], st, en))
    shapes = [(len(s[3]), len(s[4]), s[5], s[6]) for s in segments]
    print("segments:", shapes)
    by_type = {}
    for seg in segments:
        by_type.setdefault((seg[5], seg[6]), []).append(seg)
    chains = {}
    t0 = time.perf_counter()
    for (st, en), segs in by_type.items():
        tt = time.perf_counter()
        aligner = BatchAligner(params=params, start_type=st, end_type=en,
                               parity_swap=False,
                               bucket_quantum=al.bucket_quantum,
                               backend=al.backend)
        results = aligner.align_batch(
            [(s[3], s[4]) for s in segs],
            offsets=[(s[1], s[2]) for s in segs],
            traceback_mode="full")
        for seg, res in zip(segs, results):
            chains[seg[0]] = res
        print(f"  solve type ({st},{en}) x{len(segs)}: "
              f"{time.perf_counter() - tt:.2f}s")
    t_solve = time.perf_counter() - t0

    t0 = time.perf_counter()
    full_chain = []
    for k in range(len(segments)):
        full_chain.extend(chains[k].chain)
    t_stitch = time.perf_counter() - t0
    t0 = time.perf_counter()
    score = P.score_chain(a_enc, b_enc, full_chain, params)
    t_score = time.perf_counter() - t0
    t0 = time.perf_counter()
    row_a, row_b = format_alignment(bytes(a_enc), bytes(b_enc), full_chain)
    t_render = time.perf_counter() - t0
    total = t_part + t_solve + t_stitch + t_score + t_render
    print(f"score={score} chain_len={len(full_chain)}")
    print(f"PHASES: bisection={t_part:.2f}s solve={t_solve:.2f}s "
          f"stitch={t_stitch:.2f}s score={t_score:.2f}s "
          f"render={t_render:.2f}s total={total:.2f}s")


if __name__ == "__main__":
    main()
