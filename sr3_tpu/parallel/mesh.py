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
                devices: Optional[Sequence] = None,
                num_space: int = 1) -> Mesh:
    """Build a ('data', 'model', 'space') mesh. Defaults to all visible
    devices on the data axis (the reference's `gpu_ids` analog selects
    num_data). 'model' shards conv/dense channels (sharding_rules.py);
    'space' shards the activation H dimension for resolutions whose
    reverse-chain activations exceed one chip (parallel/spatial.py)."""
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // (num_model * num_space)
    devices = np.asarray(devices[: num_data * num_model * num_space]).reshape(
        num_data, num_model, num_space
    )
    return Mesh(devices, ("data", "model", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_fetch(tree):
    """``jax.device_get`` that also works on multi-process meshes.

    Single-process (and any fully-addressable leaf): plain device_get,
    zero overhead. A leaf that is a global ``jax.Array`` spanning processes
    (mesh-sharded train state, sampler outputs) is rendered fully
    replicated via ``multihost_utils.process_allgather`` — a collective,
    so EVERY process must call host_fetch together — and every process
    receives the complete global value. This is what lets checkpoint/val/
    infer run unchanged under ``jax.process_count() > 1``, where the
    reference's DataParallel never leaves one host.
    """

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True: reassemble the GLOBAL value (shards concatenated
            # in sharding order) — the only mode jax supports for
            # non-fully-addressable arrays; the default (stack a leading
            # process dim) raises on them.
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(one, tree)


def is_primary() -> bool:
    """True on the process that owns host-side writes (PNGs, metrics files,
    TB/W&B streams, checkpoint initiation)."""
    return jax.process_index() == 0


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict of NHWC numpy arrays onto the mesh, sharded on
    the leading (batch) axis. Non-array entries pass through.

    Batches whose leading dim does not divide the 'data' axis (e.g. the
    reference's batch-1 validation on an 8-way mesh) are replicated instead:
    every device computes the full batch — correct, just not parallel. The
    batched evaluator avoids this in the hot path by padding to a full mesh
    group.

    Multi-host: each process holds a disjoint contiguous shard of the global
    batch (the loader shards indices per process), assembled into one global
    array with ``jax.make_array_from_process_local_data``. The same call is
    the single-process path too (where it reduces to a device_put), so the
    multi-host assembly code is exercised by every test.
    """
    sharding = batch_sharding(mesh)
    n_data = mesh.shape["data"]
    pc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        global_batch = x.shape[0] * pc
        if global_batch % n_data != 0:
            if pc > 1:
                raise ValueError(
                    f"global batch {global_batch} not divisible by data axis "
                    f"{n_data} under multi-host; use a divisible batch"
                )
            return jax.device_put(x, replicated_sharding(mesh))
        global_shape = (global_batch,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=global_shape
        )

    return jax.tree_util.tree_map(put, batch)
