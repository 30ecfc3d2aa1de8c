import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
print("devices:", jax.devices(), flush=True)
from cse305_parallel_sequence_alignment_tpu.parallel.partition import PartitionedAligner
from cse305_parallel_sequence_alignment_tpu.utils.fasta import read_and_store_sequences
names, seqs = read_and_store_sequences("/root/reference/gene_sequences_test")
order = sorted(range(len(seqs)), key=lambda k: -len(seqs[k]))
a, b = seqs[order[0]], seqs[order[1]]
al = PartitionedAligner(p=8, fill_backend="auto")
t0 = time.perf_counter(); r1 = al.align(a, b)
print(f"cold: {time.perf_counter()-t0:.2f}s score={r1.score}", flush=True)
t0 = time.perf_counter(); r2 = al.align(a, b)
print(f"warm: {time.perf_counter()-t0:.2f}s score={r2.score}", flush=True)
assert r1.score == r2.score == 97322.0
