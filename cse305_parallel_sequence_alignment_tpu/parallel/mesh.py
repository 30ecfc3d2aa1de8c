"""Mesh construction helpers.

Axis conventions used across the framework:
- ``data``: many-pairs batch parallelism (reference P6)
- ``seq``:  long-sequence column sharding (reference P5's decomposition)
"""

from __future__ import annotations

import jax


def make_data_mesh(num_devices=None):
    """1-D mesh over the batch axis."""
    devs = jax.devices()
    n = num_devices or len(devs)
    return jax.make_mesh((n,), ("data",), devices=devs[:n])


def make_seq_mesh(num_devices=None):
    """1-D mesh over the DP column axis (long-sequence mode)."""
    devs = jax.devices()
    n = num_devices or len(devs)
    return jax.make_mesh((n,), ("seq",), devices=devs[:n])


def make_2d_mesh(data=None, seq=None):
    """2-D (data, seq) mesh: batches of long-sequence problems."""
    devs = jax.devices()
    total = len(devs)
    if data is None and seq is None:
        seq = 1
        data = total
    elif data is None:
        data = total // seq
    elif seq is None:
        seq = total // data
    use = data * seq
    return jax.make_mesh((data, seq), ("data", "seq"), devices=devs[:use])
