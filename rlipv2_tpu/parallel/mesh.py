"""Device mesh construction + sharding rules.

The reference's distributed layer is DDP over NCCL with env-var rendezvous
(reference: util/misc.py:387-417, main.py:515-519). The TPU-native
equivalent is a `jax.sharding.Mesh` with a `data` axis (DP — the only
parallelism the reference has) plus an optional `model` axis reserved for
FSDP-style parameter sharding of Swin-L (SURVEY.md §2.8). Gradients are
all-reduced by XLA's SPMD partitioner; there is no hand-written backend.

Everything here is pjit-style "global program" semantics: the train step
is written once over global arrays; sharding annotations on inputs place
the batch across the mesh and XLA inserts the collectives (psum over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D data mesh by default; pass axis_names=('data','model') with a
    `shape` factorization (e.g. (2, 4)) for hybrid DP+FSDP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devs = np.asarray(devices)
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    if shape is None:
        # data gets everything, other axes = 1
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(tuple(shape)), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of batch-leading arrays onto the mesh, sharded on the
    leading dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
