"""Device-mesh data parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
(model/networks.py:113-115): replicate params, scatter the batch, gather and
average the loss. The TPU-native equivalent is a 1-D ``jax.sharding.Mesh``
over ICI: the batch is sharded on the 'data' axis, params are replicated, and
XLA inserts the gradient psum-mean automatically from the sharding
annotations under jit. Multi-host (DCN) comes free from
``jax.distributed.initialize`` plus the same mesh.

A second 'model' axis is reserved for tensor sharding of wide conv/attention
channels (beyond the reference's capability envelope; off by default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_data: Optional[int] = None, num_model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all visible devices on the
    data axis (the reference's `gpu_ids` analog selects num_data)."""
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    devices = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model
    )
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict of NHWC numpy arrays onto the mesh, sharded on
    the leading (batch) axis. Non-array entries pass through."""
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
