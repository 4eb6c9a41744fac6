"""Fused GroupNorm + SiLU (Swish).

The reference's hot block is GroupNorm -> Swish -> (Dropout) -> Conv3x3
(model/sr3_modules/unet.py:80-91). On TPU the normalize+activate epilogue is
memory-bound, so we fuse it into one Pallas kernel (one HBM read + one write
per element); a pure-XLA path is kept as the reference implementation and the
fallback for blocks that exceed VMEM.

Layout: NHWC. Stats are computed in f32 regardless of input dtype
(torch GroupNorm semantics, eps=1e-5).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def group_norm_swish_xla(x, scale, bias, num_groups, eps=1e-5, swish=True):
    """x: (B,H,W,C). scale/bias: (C,). Returns same shape/dtype as x."""
    b, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if swish:
        xn = xn * jax.nn.sigmoid(xn)
    return xn.astype(x.dtype)


_HW_CHUNK = 1024


def _gn_swish_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, swish):
    """One batch element per grid cell. x_ref: (1, HW, C).

    Two passes over HW chunks so the f32 temporaries never exceed one chunk:
    the bf16 block stays resident in VMEM while stats accumulate chunkwise.
    """
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // num_groups
    chunk = min(_HW_CHUNK, hw)
    n_chunks = hw // chunk  # hw is a power of two >= chunk

    # pass 1: per-channel sums, chunked (f32 accumulation)
    def stats_body(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s1 + jnp.sum(xc, axis=0, keepdims=True), \
               s2 + jnp.sum(xc * xc, axis=0, keepdims=True)

    s1 = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, stats_body, (s1, s2))

    # fold channels into groups with a (C,G) indicator matmul — Mosaic cannot
    # shape-cast the lane dim into sublanes, so reshape-folding is off limits
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    cmask = (chan // cg == grp).astype(jnp.float32)  # (C, G)
    g1 = jnp.dot(s1, cmask, preferred_element_type=jnp.float32)  # (1, G)
    g2 = jnp.dot(s2, cmask, preferred_element_type=jnp.float32)
    n = jnp.float32(hw * cg)
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, cmask.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, cmask.T, preferred_element_type=jnp.float32)
    sc = scale_ref[0].astype(jnp.float32) * rstd_c
    off = bias_ref[0].astype(jnp.float32) - mean_c * sc

    # pass 2: normalize + swish, chunked
    def norm_body(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * sc + off
        if swish:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "swish", "interpret")
)
def group_norm_swish_pallas(x, scale, bias, num_groups, eps=1e-5, swish=True,
                            interpret=False):
    b, h, w, c = x.shape
    hw = h * w
    x2 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(
            _gn_swish_kernel, num_groups=num_groups, eps=eps, swish=swish
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(b, h, w, c)


# The ~16MB/core scoped VMEM budget must hold the in+out blocks plus the
# chunk-sized f32 temporaries (the kernel iterates HW in _HW_CHUNK slices, so
# temporaries no longer scale with the block). Bigger blocks fall back to XLA.
_VMEM_BLOCK_LIMIT = 4 * 1024 * 1024


def _gn_swish_fwd_bwd(num_groups, eps, swish, interpret):
    """custom_vjp wrapper: Pallas forward (fused, one HBM pass), XLA backward
    (reductions + elementwise — XLA fuses these into the surrounding conv
    grads). Stats are recomputed in the backward; they're cheap relative to
    the conv backward this feeds."""

    @jax.custom_vjp
    def f(x, scale, bias):
        return group_norm_swish_pallas(
            x, scale, bias, num_groups, eps=eps, swish=swish,
            interpret=interpret,
        )

    def fwd(x, scale, bias):
        return f(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        x, scale, bias = res
        b, h, w, c = x.shape
        cg = c // num_groups
        xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
        gf = g.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = ((xf - mean) * rstd).reshape(b, h, w, c)
        sc = scale.astype(jnp.float32)
        z = xhat * sc + bias.astype(jnp.float32)
        if swish:
            s = jax.nn.sigmoid(z)
            dz = gf * (s * (1 + z * (1 - s)))
        else:
            dz = gf
        dbias = jnp.sum(dz, axis=(0, 1, 2))
        dscale = jnp.sum(dz * xhat, axis=(0, 1, 2))
        dzg = (dz * sc).reshape(b, h * w, num_groups, cg)
        m1 = jnp.mean(dzg, axis=(1, 3), keepdims=True)
        m2 = jnp.mean(dzg * xhat.reshape(b, h * w, num_groups, cg),
                      axis=(1, 3), keepdims=True)
        dx = (
            rstd * (dzg - m1 - xhat.reshape(b, h * w, num_groups, cg) * m2)
        ).reshape(b, h, w, c)
        return dx.astype(x.dtype), dscale, dbias

    f.defvjp(fwd, bwd)
    return f


def group_norm_swish(x, scale, bias, num_groups, eps=1e-5, swish=True,
                     use_pallas=None, interpret=False):
    """GroupNorm(+Swish): XLA by default, Pallas kernel opt-in.

    Measured on v5e with the full 16->128 UNet (batch 8): XLA 8.26 ms/fwd vs
    9.99 ms with the Pallas kernel dispatched — pallas_call is a fusion
    barrier, and XLA fuses the normalize+swish epilogue into the surrounding
    conv/cast/residual chains, leaving the whole model at ~87% of HBM
    speed-of-light. The kernel is kept behind ``use_pallas=True`` /
    ``SR3_PALLAS_GN=1`` for shapes where XLA's fusion falls apart.
    """
    b, h, w, c = x.shape
    block_bytes = h * w * c * x.dtype.itemsize
    if use_pallas is None:
        hw = h * w
        use_pallas = (
            os.environ.get("SR3_PALLAS_GN") == "1"
            and jax.default_backend() == "tpu"
            and block_bytes <= _VMEM_BLOCK_LIMIT
            and c % num_groups == 0
            and c >= 64
            and (hw <= _HW_CHUNK or hw % _HW_CHUNK == 0)
        )
    if use_pallas:
        return _gn_swish_fwd_bwd(num_groups, eps, swish, interpret)(
            x, scale, bias
        )
    return group_norm_swish_xla(x, scale, bias, num_groups, eps=eps, swish=swish)
