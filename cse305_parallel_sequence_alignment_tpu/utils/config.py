"""Run configuration with the reference harness's constants as defaults.

The reference hardcodes everything (g=1, h=2, p=32/64, truncation 50,
test-pair counts; testing.cpp:72,134,150,213,261,345). Here the same values
are defaults of a dataclass, overridable from the CLI.
"""

from __future__ import annotations

import argparse
import dataclasses

from cse305_parallel_sequence_alignment_tpu.core import ScoringParams


@dataclasses.dataclass
class RunConfig:
    data_path: str = "/root/reference/gene_sequences_test"
    g: float = 1.0          # gap extend (testing.cpp:134)
    h: float = 2.0          # gap open (testing.cpp:134)
    match: float = 1.0
    mismatch: float = 0.0
    input_size: int = 50    # truncation (testing.cpp:150)
    # input-size experiment batch. The reference HEAD hardcodes 1
    # (testing.cpp:85) — an experiment that measures a single 50x50
    # alignment; the shipped default is a real batch so the CSV carries
    # meaningful device-throughput attribution. Pass --test-pairs 1 for
    # the literal reference configuration.
    test_pairs: int = 256
    n_cores_pairs: int = 2000   # n-cores experiment (testing.cpp:213)
    similarity_pairs: int = 2000  # similarity experiment (testing.cpp:298)
    # similarity experiment alignment length: 0 = full min length, the
    # reference's behavior (input_size_min = minlen, testing.cpp:333-345);
    # > 0 truncates like the input-size experiment does
    similarity_input_size: int = 0
    seed: int = 0           # reference uses unseeded rand(); we seed
    bucket_quantum: int = 128
    max_batch: int = 512
    out_dir: str = "."

    @property
    def params(self) -> ScoringParams:
        return ScoringParams(g=self.g, h=self.h, match=self.match,
                             mismatch=self.mismatch)


def add_config_args(parser: argparse.ArgumentParser):
    d = RunConfig()
    parser.add_argument("--data", dest="data_path", default=d.data_path)
    parser.add_argument("--g", type=float, default=d.g,
                        help="gap extend cost")
    parser.add_argument("--h", type=float, default=d.h, help="gap open cost")
    parser.add_argument("--match", type=float, default=d.match)
    parser.add_argument("--mismatch", type=float, default=d.mismatch)
    parser.add_argument("--input-size", type=int, default=d.input_size)
    parser.add_argument("--similarity-input-size", type=int,
                        default=d.similarity_input_size,
                        help="0 = align similarity pairs at full min "
                             "length (reference behavior)")
    parser.add_argument("--test-pairs", type=int, default=d.test_pairs)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--bucket-quantum", type=int,
                        default=d.bucket_quantum)
    parser.add_argument("--max-batch", type=int, default=d.max_batch)
    parser.add_argument("--out-dir", default=d.out_dir)
    return parser


def config_from_args(args) -> RunConfig:
    cfg = RunConfig()
    for f in dataclasses.fields(RunConfig):
        if hasattr(args, f.name):
            setattr(cfg, f.name, getattr(args, f.name))
    return cfg
