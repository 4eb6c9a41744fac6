"""Dropout with the mask recomputed in the backward pass (VERDICT r04 #3).

Standard dropout makes XLA carry the keep-mask from forward to backward as a
saved residual — on the flagship 16->128 train step that is ~4.8 GB of the
44.5 GB per-step HBM traffic (docs/TRAINSCAN_r03.txt:26), ~10% of a step that
is memory-bound at 0.97x the bytes roofline. But the mask is a pure function
of the PRNG key: ``custom_vjp`` with the KEY as the only residual lets the
backward pass regenerate it on-chip (cheap threefry VPU work) instead of
re-reading it from HBM. Bit-identical semantics — same key, same bernoulli
call, same mask in both passes; ``dropout_stored`` is the reference
implementation the equivalence tests (tests/test_ops.py) and the
``SR3_DROPOUT_STORED=1`` A/B bench compare against.

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
