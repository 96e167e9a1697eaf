"""Mesh data parallelism — the TPU-native replacement for ParallelModel.

The reference's entire distributed story is single-host tower data
parallelism with CPU split/concat and implicit gradient aggregation
(core/parallel_model.py:7-90; BATCH_SIZE = IMAGES_PER_GPU * GPU_COUNT,
core/config.py:291-298). Here the same semantics fall out of
``jax.sharding``: batches are sharded over the mesh's ``data`` axis, params
are replicated, and XLA inserts the gradient all-reduce over ICI during the
jitted train step — no tower graphs, no host round-trips.

``GPU_COUNT`` maps to the data-parallel degree (``DEVICES_PER_HOST`` caps
it). The same mesh object later grows a ``space`` axis for spatial-domain
sharding of oversized volumes (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(config=None, devices=None, data_axis: str = "data"):
    """1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        want = None
        if config is not None:
            want = getattr(config, "DEVICES_PER_HOST", None) or None
            if want is None and int(getattr(config, "GPU_COUNT", 1)) > 1:
                want = int(config.GPU_COUNT)
        if want:
            devices = devices[: int(want)]
    return Mesh(np.asarray(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data"):
    return NamedSharding(mesh, P(data_axis))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Shard every leaf's leading (batch) axis across the mesh.

    Falls back to replication for leaves whose batch dim doesn't divide the
    mesh (e.g. shared anchors)."""
    n = mesh.devices.size

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(data_axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)
