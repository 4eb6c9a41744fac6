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
    """x: (B,H,W,C). scale/bias: (C,). Returns same shape/dtype as x.

    Stats use the one-pass sum/sum-of-squares formulation: ``mean`` and
    ``E[x^2]`` are independent reduces over the same input, so XLA
    multi-output-fuses them into a single traversal of the activation. The
    textbook two-pass form (``var = mean((x - mean)^2)``) makes the second
    reduce *depend* on the first, forcing two full HBM passes — at 512^2
    the stat passes were ~38% of the sampling step (docs/PROF512_r03.txt).
    Cancellation risk is negligible here: inputs are bf16-quantized
    (~3 significant digits) while the f32 accumulator carries ~7, and GN
    input statistics keep |mean|/std moderate (checked by the torch-parity
    tests at atol 2e-4)."""
    b, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    msq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if swish:
        xn = xn * jax.nn.sigmoid(xn)
    return xn.astype(x.dtype)


_HW_CHUNK = 1024


# ------------------------------------------------------- stats-only kernel
#
# At >=256^2 feature maps XLA's GN stat reduces run 4-20x above their read
# floor (docs/GNEXP_r03.txt): the (N sublane, C lane) activation layout at
# C=64 half-fills the lanes and the f32-convert reduce over the major (H,W)
# dims schedules poorly (docs/PROF512_r03.txt — the convert_reduce_fusion
# family is ~38% of the 512^2 sampling step). This kernel computes ONLY the
# per-(batch, channel) sum and sum-of-squares, HW-blocked so VMEM holds one
# block at a time; the normalize stays in XLA where it fuses into the
# surrounding conv/cast chains. The input is presented as a logical
# (H, W, B, C) transpose: XLA's chosen activation layout is typically
# {3,0,2,1} (physical order H, W, N, C), so the transpose to a row-major
# consumer is a bitcast, not a copy.

def _gn_stats_kernel(x_ref, s1_ref, s2_ref, *, chunked=False):
    """x_ref: (block_h, W, B, C). Accumulates (B, C) f32 sums over grid.

    chunked=True converts/accumulates one H row at a time instead of
    materializing the whole block as an f32 temporary (an A/B variant for
    VMEM-pressure effects; docs/GNEXP_r03.txt)."""
    if chunked:
        bh = x_ref.shape[0]

        def body(i, carry):
            a1, a2 = carry
            xc = x_ref[i].astype(jnp.float32)  # (W, B, C)
            return a1 + jnp.sum(xc, axis=0), a2 + jnp.sum(xc * xc, axis=0)

        zero = jnp.zeros(x_ref.shape[2:], jnp.float32)
        s1, s2 = jax.lax.fori_loop(0, bh, body, (zero, zero))
    else:
        xc = x_ref[...].astype(jnp.float32)
        s1 = jnp.sum(xc, axis=(0, 1))
        s2 = jnp.sum(xc * xc, axis=(0, 1))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        s1_ref[...] += s1
        s2_ref[...] += s2


_STATS_BLOCK_BYTES = 2 * 1024 * 1024


def _stats_block_h(h, w, b, c, itemsize, budget=None):
    """Largest power-of-two divisor of h whose block fits the VMEM budget."""
    budget = _STATS_BLOCK_BYTES if budget is None else budget
    bh = 1
    while (
        bh * 2 <= h
        and h % (bh * 2) == 0
        and bh * 2 * w * b * c * itemsize <= budget
    ):
        bh *= 2
    return bh


def gn_stats_pallas(x, interpret=False, chunked=None, block_bytes=None):
    """Per-(batch, channel) sum and sumsq of x:(B,H,W,C) in one HBM pass.

    Returns (s1, s2), each f32 (B, C)."""
    if chunked is None:
        chunked = os.environ.get("SR3_GN_STATS_CHUNK") == "1"
    if block_bytes is None:
        block_bytes = int(
            os.environ.get("SR3_GN_STATS_BLOCK", _STATS_BLOCK_BYTES))
    b, h, w, c = x.shape
    xt = jnp.transpose(x, (1, 2, 0, 3))  # layout-matching bitcast (see above)
    bh = _stats_block_h(h, w, b, c, x.dtype.itemsize, budget=block_bytes)
    s1, s2 = pl.pallas_call(
        functools.partial(_gn_stats_kernel, chunked=chunked),
        grid=(h // bh,),
        in_specs=[pl.BlockSpec((bh, w, b, c), lambda i: (i, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((b, c), lambda i: (0, 0)),
            pl.BlockSpec((b, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
        interpret=interpret,
    )(xt)
    return s1, s2


def _group_fold(s1, s2, n, num_groups, eps):
    """(B,C) channel sums -> per-channel mean/rstd of the group stats."""
    b, c = s1.shape
    cg = c // num_groups
    g1 = jnp.sum(s1.reshape(b, num_groups, cg), axis=2)
    g2 = jnp.sum(s2.reshape(b, num_groups, cg), axis=2)
    cnt = jnp.float32(n * cg)
    mean_g = g1 / cnt
    var_g = jnp.maximum(g2 / cnt - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=1)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)
    return mean_c, rstd_c  # (B, C) each


def _gn_swish_stats_fwd_bwd(num_groups, eps, swish, interpret):
    """Pallas stats (one full-bandwidth HBM pass) + XLA normalize epilogue
    (fuses into the surrounding conv/cast chains). Backward recomputes via
    the same Pallas stats pass; the gradient reductions stay in XLA."""

    def norm(x, scale, bias, mean_c, rstd_c):
        xf = x.astype(jnp.float32)
        sc = scale.astype(jnp.float32) * rstd_c[:, None, None, :]
        off = bias.astype(jnp.float32) - mean_c[:, None, None, :] * sc
        z = xf * sc + off
        if swish:
            z = z * jax.nn.sigmoid(z)
        return z.astype(x.dtype)

    @jax.custom_vjp
    def f(x, scale, bias):
        b, h, w, c = x.shape
        s1, s2 = gn_stats_pallas(x, interpret=interpret)
        mean_c, rstd_c = _group_fold(s1, s2, h * w, num_groups, eps)
        return norm(x, scale, bias, mean_c, rstd_c)

    def fwd(x, scale, bias):
        b, h, w, c = x.shape
        s1, s2 = gn_stats_pallas(x, interpret=interpret)
        mean_c, rstd_c = _group_fold(s1, s2, h * w, num_groups, eps)
        # stash the tiny (B,C) stats so the backward skips a whole extra
        # HBM traversal of the activation
        return (
            norm(x, scale, bias, mean_c, rstd_c),
            (x, scale, bias, mean_c, rstd_c),
        )

    def bwd(res, g):
        x, scale, bias, mean_c, rstd_c = res
        b, h, w, c = x.shape
        cg = c // num_groups
        xf = x.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        xhat = (xf - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
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
        xhg = xhat.reshape(b, h * w, num_groups, cg)
        m1 = jnp.mean(dzg, axis=(1, 3), keepdims=True)
        m2 = jnp.mean(dzg * xhg, axis=(1, 3), keepdims=True)
        rs = rstd_c.reshape(b, 1, num_groups, cg)[:, :, :, :1]
        dx = (rs * (dzg - m1 - xhg * m2)).reshape(b, h, w, c)
        return dx.astype(x.dtype), dscale, dbias

    f.defvjp(fwd, bwd)
    return f


# The stats kernel targets the large-map regime (>=256^2) where XLA's GN
# reduces run 4-20x above their read floor — but measured on v5e it LOSES
# to the one-pass XLA formulation everywhere (docs/GNEXP_r03.txt: 3.6 vs
# 2.2 ms at 512^2xC64, 9.4 vs 2.9 ms at 1024^2): the kernel is
# VPU-compute-bound at the same 50% lane occupancy that hurts XLA, so one
# full-bandwidth DMA pass doesn't pay for the unvectorized reduce. In-model
# it was ~1.5% slower at 512^2 train and broke the 1024^2 train compile.
# Opt-in via SR3_PALLAS_GN_STATS=1 for shapes where XLA's fusion regresses.
_STATS_MIN_HW = 256 * 256

# Under spatial ('space' axis) activation sharding a pallas_call would force
# GSPMD to all-gather the H-sharded activation, defeating the sharding's
# memory point; the Trainer constructs such models with pallas_gn=False
# (threaded through UNet -> Block -> here as use_pallas=False, which
# disables BOTH Pallas GN paths), so two coexisting trainers — e.g. a
# cascade holding a spatial and a non-spatial stage — never affect each
# other's lowering.


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
        # one-pass stats (see group_norm_swish_xla): mean and E[x^2] are
        # independent reduces, so XLA fuses the recompute into one HBM pass
        msq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
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

    ``use_pallas``: None = auto (env-gated); True = force the fused kernel;
    False = force plain XLA, disabling BOTH Pallas paths (the fused GN+Swish
    kernel and the stats-only kernel) — the per-model escape hatch used
    under spatial activation sharding, where any pallas_call would make
    GSPMD all-gather the H-sharded activation.
    """
    b, h, w, c = x.shape
    hw = h * w
    block_bytes = h * w * c * x.dtype.itemsize
    pallas_allowed = use_pallas is not False
    if use_pallas is None:
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
    use_stats = (
        pallas_allowed
        and os.environ.get("SR3_PALLAS_GN_STATS") == "1"
        and jax.default_backend() == "tpu"
        and hw >= _STATS_MIN_HW
        and c % num_groups == 0
        and (h & (h - 1)) == 0  # power-of-two H for the block divisor walk
    )
    if use_stats:
        return _gn_swish_stats_fwd_bwd(num_groups, eps, swish, interpret)(
            x, scale, bias
        )
    return group_norm_swish_xla(x, scale, bias, num_groups, eps=eps, swish=swish)
