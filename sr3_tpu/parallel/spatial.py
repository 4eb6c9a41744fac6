"""Spatial (H-axis) activation sharding for beyond-single-chip resolutions.

The reference's answer to large images was to shrink the model and disable
attention so 512^2 fit an 11GB 1080Ti (config/sr_sr3_64_512.json,
README.md:45); anything larger was out of reach. On TPU the natural scale-up
is GSPMD spatial partitioning: shard the activation **H** dimension over a
'space' mesh axis and let XLA insert the halo exchanges for the 3x3 convs
(ppermute of one-row halos over ICI), the cross-shard reductions for
GroupNorm, and the gathers around coarse-resolution attention. Per-chip
activation memory drops ~linearly in the space-axis size, so reverse chains
at 1024^2+ that cannot fit one chip compile and run on a slice.

Numerics are unchanged — GSPMD is semantics-preserving; layout is the only
thing sharded (equivalence-tested against the unsharded chain in
tests/test_spatial.py).

Usage: `"parallel": {"space": N}` in the config (Trainer wires the
constraint into the diffusion core), or set
``diffusion.shard_activations = spatial_constraint(mesh)`` directly.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_constraint(mesh: Mesh):
    """Return a callable pinning NHWC activations to P('data', 'space').

    Applied to the reverse-chain carry and the training noised image
    (models/diffusion.py), it anchors GSPMD propagation so every UNet level
    keeps its H dimension sharded instead of collapsing to replicated.
    Tensors whose batch/H don't divide the respective axis pass through
    unconstrained (XLA picks a layout; correctness is unaffected).
    """
    n_space = mesh.shape["space"]
    n_data = mesh.shape["data"]
    sharding = NamedSharding(mesh, P("data", "space"))

    def constrain(x):
        if (
            x.ndim == 4
            and x.shape[0] % n_data == 0
            and x.shape[1] % n_space == 0
        ):
            return jax.lax.with_sharding_constraint(x, sharding)
        return x

    return constrain
