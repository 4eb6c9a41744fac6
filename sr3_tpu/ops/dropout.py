"""Dropout with the mask recomputed in the backward pass (VERDICT r04 #3).

MEASURED NULL RESULT (docs/TRAINSCAN_r05.txt, tools/dropout_bench.py): on
the flagship 16->128 b16 train step the recompute path is byte-identical to
plain dropout — 53.14 vs 53.12 ms/step AND identical compiled memory
footprints (temp 2.126 GB both modes, XLA memory_analysis). The hypothesis
(r03's trainscan attributed ~4.8 GB of the 44.5 GB step bytes to saved
keep-masks) is falsified at the compiler level: the mask is a pure function
of the PRNG key in BOTH formulations, XLA CSEs the threefry between forward
and backward and schedules the same program either way. Hand-rolling the
rematerialization via ``custom_vjp`` (KEY as the only residual) changes
nothing — kept as the experiment record plus the ``SR3_DROPOUT_STORED=1``
A/B toggle that reproduces the measurement; ``dropout_stored`` is the
yardstick the equivalence tests (tests/test_ops.py) compare against.

Matches flax ``nn.Dropout`` math (keep = 1-rate; x/keep where kept, else 0):
the reference applies torch ``nn.Dropout`` between swish and conv in every
block (reference sr3_modules/unet.py:80-91) — same inverted-scaling
convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _apply_mask(x, key, rate):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype))


def dropout_stored(x, key, rate):
    """Plain dropout: XLA saves the mask for the backward pass (the
    residual-bytes behavior being optimized away; kept as the equivalence
    yardstick and the SR3_DROPOUT_STORED=1 fallback)."""
    if rate <= 0.0:
        return x
    return _apply_mask(x, key, rate)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout_recompute(x, key, rate):
    """Dropout whose backward regenerates the mask from ``key`` instead of
    saving it: residuals shrink from O(x.size) mask bytes to one PRNG key."""
    return _apply_mask(x, key, rate)


def _fwd(x, key, rate):
    return _apply_mask(x, key, rate), key


def _bwd(rate, key, g):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=g.shape)
    gx = jnp.where(mask, g / jnp.asarray(keep, g.dtype),
                   jnp.zeros((), g.dtype))
    return gx, None  # no cotangent for the key


dropout_recompute.defvjp(_fwd, _bwd)


def dropout(x, key, rate, stored=False):
    """Dispatch: recompute-in-backward by default; ``stored=True`` (or the
    SR3_DROPOUT_STORED=1 env read at the call site) selects the plain
    save-the-mask version for A/B measurement."""
    if rate <= 0.0:
        return x
    if stored:
        return dropout_stored(x, key, rate)
    return dropout_recompute(x, key, rate)
