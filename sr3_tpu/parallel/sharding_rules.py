"""Tensor-parallel parameter sharding over the mesh 'model' axis.

Beyond the reference's capability envelope (its only parallelism is
DataParallel): conv/dense kernels are sharded on their output-channel
dimension, biases and norm affines on the channel dimension. XLA GSPMD
propagates these shardings through the UNet and inserts the collectives —
the approach of the scaling-book recipe: annotate params, shard the batch,
let the compiler place psum/all-gather on ICI.

Numerics are unchanged (same math, distributed layout); validated by the
tp-vs-single-device equivalence test on a virtual CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_spec(path, leaf) -> P:
    """PartitionSpec for one UNet parameter.

    Kernels: shard the output-channel (last) dim on 'model' when divisible.
    1-D channel vectors (biases, norm scale/bias): shard on 'model'.
    Everything else: replicated.
    """
    if leaf.ndim >= 2:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    if leaf.ndim == 1:
        return P("model")
    return P()


def make_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the params, falling back to replication for
    leaves whose sharded dim isn't divisible by the model-axis size."""
    n_model = mesh.shape["model"]

    def spec_for(path, leaf):
        spec = param_partition_spec(path, leaf)
        # drop the 'model' axis when the dim doesn't divide evenly
        dims = [
            (None if (s == "model" and leaf.shape[i] % n_model != 0) else s)
            for i, s in enumerate(spec)
        ]
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh with tensor-parallel shardings ('model'
    axis size 1 degrades to plain replication)."""
    if mesh.shape["model"] == 1:
        return jax.device_put(params, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s),
        params,
        make_param_shardings(params, mesh),
    )


def shard_state(state, mesh: Mesh):
    """Place a whole train state (params + optimizer moments + EMA + step)
    on the mesh: the per-leaf shape rule gives adam's mu/nu the same layout
    as the params they mirror; scalars replicate."""
    if mesh.shape["model"] == 1:
        return jax.device_put(state, NamedSharding(mesh, P()))
    n_model = mesh.shape["model"]

    def put(leaf):
        leaf = np.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        spec = param_partition_spec((), leaf)
        dims = [
            (None if (s == "model" and leaf.shape[i] % n_model != 0) else s)
            for i, s in enumerate(spec)
        ]
        return jax.device_put(leaf, NamedSharding(mesh, P(*dims)))

    return jax.tree_util.tree_map(put, state)
