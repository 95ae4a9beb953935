"""Device mesh and sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.4): multi-GPU
is independent OS processes + lock files.  Here parallelism is jax-native:
a ``Mesh`` over the chips, batches sharded on the ``data`` axis, parameters
replicated, and XLA inserting the ICI collectives (gradient psum, InfoNCE
all-gather) under ``jit``.

The train steps are written as *global-batch* programs and jitted with
NamedSharding constraints — XLA's SPMD partitioner handles the rest, which
is the idiomatic pjit data-parallel pattern (vs. translating NCCL calls).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple[int, ...] = None, axes: tuple[str, ...] = ("data",)) -> Mesh:
    """Build a mesh over available devices.  Default: all devices on 'data'."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over ``axis``; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
