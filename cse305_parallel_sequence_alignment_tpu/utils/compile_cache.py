"""Persistent XLA compilation cache setup.

The evaluation TPU compiles through a loopback "remote" compile service
on a 2-core VM: a FRESH program costs minutes of wall clock (measured
70-350 s for the long-fill kernels), a cached one ~1 s. The service's
own cache evicts large entries, so the framework enables JAX's
persistent on-disk cache with aggressive thresholds; together with the
coarse shape quantization in ops/pallas_longrow.py this makes every
entry point (CLI, bench.py, harness) pay each program's compile at most
once per machine.

Opt out with TPU_SEQALIGN_NO_CACHE=1 or point JAX_COMPILATION_CACHE_DIR
somewhere else.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tpu_seqalign_jax")

_done = False


def enable_persistent_cache():
    """Idempotently configure jax's persistent compilation cache."""
    global _done
    if _done or os.environ.get("TPU_SEQALIGN_NO_CACHE"):
        return
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # CPU runs (tests, dryruns) don't pay the tunnel compile cost,
        # and reloading AOT CPU executables across toolchain updates
        # warns about machine-feature mismatches (SIGILL risk)
        return
    _done = True
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.4)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
