"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes so sharded/multi-chip code paths
(parallel/*) are testable without TPU hardware, mirroring how the same
shard_map programs run over ICI on a real slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-import jax (site hooks) with a TPU platform
# override before this conftest runs; force the CPU backend explicitly so
# tests never block on remote-device initialization. XLA_FLAGS above is
# still honored: backends initialize lazily, at first use, not at import.
import jax

jax.config.update("jax_platforms", "cpu")

import json
import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "cases.jsonl"


def load_golden(kind=None):
    records = [json.loads(line) for line in GOLDEN.read_text().splitlines()]
    if kind is not None:
        records = [r for r in records if r["kind"] == kind]
    return records


@pytest.fixture(scope="session")
def golden_pipeline():
    return load_golden("pipeline")


@pytest.fixture(scope="session")
def golden_subproblem():
    return load_golden("subproblem")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles many hundreds of CPU programs in one
    process; past ~80% the XLA CPU backend segfaults INSIDE a compile
    (reproduced three times at the same test, with and without the
    persistent cache, on an idle machine — accumulated JIT state, not
    this repo's code). Dropping executables at module boundaries keeps
    the process under the trigger threshold at the cost of some
    cross-module recompiles."""
    yield
    jax.clear_caches()
