"""Epsilon-prediction UNet, TPU-native (flax.linen, NHWC).

One parameterized backbone replaces the reference's two ~90%-duplicated trees
(model/sr3_modules/unet.py:161-259 and model/ddpm_modules/unet.py:146-243).
The conditioning switch selects:

- ``cond_mode='sr3'``: continuous noise-level (sqrt-gamma) input, WaveGrad-style
  positional encoding, FiLM injection after the first block
  (reference sr3_modules/unet.py:18-50,94-110);
- ``cond_mode='ddpm'``: integer-timestep input, sinusoidal embedding, bias
  injection through Swish->Dense (reference ddpm_modules/unet.py:19-34,78-96).

Both share identical frequencies: exp(-ln(1e4) * i/count), i in [0, dim/2).

Structure parity (for the .pth weight converter): layer indices mirror the
reference ModuleLists — ``downs_0`` is the stem conv, then ResnetBlocWithAttn /
Downsample entries, ``mid_0``/``mid_1``, ``ups_i``, ``final_conv``.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sr3_tpu.ops.attention import self_attention
from sr3_tpu.ops.conv_fused import gn_silu_conv3x3
from sr3_tpu.ops.dropout import dropout
from sr3_tpu.ops.groupnorm import group_norm_swish


def _kernel_init(init_type: str):
    if init_type == "orthogonal":
        # reference trains with orthogonal init, gain 1 (model/networks.py:45-57,110-112)
        return nn.initializers.orthogonal()
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(0.2, "fan_in", "normal")
    if init_type == "normal":
        return nn.initializers.normal(stddev=0.02)
    return nn.initializers.lecun_normal()


def positional_encoding(cond: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(b,) condition scalar -> (b, dim) [sin || cos] features.

    Matches both reference encoders (sr3_modules/unet.py:23-31,
    ddpm_modules/unet.py:29-34): freq_i = exp(-ln(1e4) * i / (dim/2)).
    """
    count = dim // 2
    cond = cond.reshape(-1).astype(jnp.float32)
    step = jnp.arange(count, dtype=jnp.float32) / count
    enc = cond[:, None] * jnp.exp(-math.log(1e4) * step[None, :])
    return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class GroupNormSwish(nn.Module):
    """GroupNorm with optional fused SiLU epilogue (Pallas on TPU)."""

    num_groups: int
    swish: bool = True
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_swish(
            x, scale, bias, self.num_groups, eps=1e-5, swish=self.swish,
            use_pallas=self.use_pallas,
        )


class _GNParams(nn.Module):
    """Parameter holder matching GroupNormSwish's tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree ({kernel, bias})."""

    features: int
    in_features: int
    init_type: str

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _kernel_init(self.init_type),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class Block(nn.Module):
    """GroupNorm -> Swish -> Dropout -> Conv3x3 (reference unet.py:80-91).

    Deterministic path (sampling, or dropout=0 training) dispatches the
    single-HBM-pass fused Pallas kernel on TPU (ops/conv_fused.py), with the
    ResnetBlock's FiLM / bias conditioning folded in as a per-(batch,
    channel) pre-affine. The param tree is identical to the submodule
    composition ({norm: {scale, bias}, conv: {kernel, bias}}), so
    checkpoints and the .pth converter are unaffected.
    """

    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32
    init_type: str = "orthogonal"
    pallas_gn: Optional[bool] = None  # False = no Pallas GN/conv kernels

    @nn.compact
    def __call__(self, x, *, train: bool = False, pre_scale=None,
                 pre_bias=None, residual=None):
        c = x.shape[-1]
        gn_scale, gn_bias = _GNParams(c, name="norm")()
        kernel, bias = _ConvParams(self.dim_out, c, self.init_type,
                                   name="conv")()

        dropout_active = train and self.dropout > 0.0
        if not dropout_active:
            # The Pallas kernel is opt-in (SR3_FUSED_CONV=1): measured on
            # v5e it wins 1.4-1.8x in isolation at C>=256 but the whole
            # model runs ~12% slower than XLA's cross-op fusion
            # (ops/conv_fused.py docstring has the numbers).
            use_pallas = (
                None if (os.environ.get("SR3_FUSED_CONV") == "1"
                         and self.pallas_gn is not False) else False
            )
            return gn_silu_conv3x3(
                x, gn_scale, gn_bias, kernel.astype(self.dtype),
                bias, self.groups, pre_scale=pre_scale, pre_bias=pre_bias,
                residual=residual, use_pallas=use_pallas,
            )

        # training path with dropout between swish and conv
        if pre_scale is not None:
            x = x * pre_scale[:, None, None, :].astype(x.dtype)
        if pre_bias is not None:
            x = x + pre_bias[:, None, None, :].astype(x.dtype)
        h = group_norm_swish(x, gn_scale, gn_bias, self.groups, eps=1e-5,
                             use_pallas=self.pallas_gn)
        # ops/dropout.py: backward regenerates the mask from the key.
        # Measured perf-neutral on v5e — XLA already rematerializes the
        # key-derived mask either way (docs/TRAINSCAN_r05.txt); the
        # SR3_DROPOUT_STORED=1 toggle reproduces that A/B.
        h = dropout(
            h, self.make_rng("dropout"), self.dropout,
            stored=os.environ.get("SR3_DROPOUT_STORED") == "1",
        )
        h = jax.lax.conv_general_dilated(
            h.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)
        if residual is not None:
            h = h + residual.astype(h.dtype)
        return h


class ResnetBlock(nn.Module):
    """Block -> conditioning injection -> Block + 1x1 skip
    (reference sr3_modules/unet.py:94-110 / ddpm_modules/unet.py:78-96)."""

    dim_out: int
    cond_mode: str = "sr3"  # 'sr3' | 'ddpm'
    use_affine_level: bool = False
    norm_groups: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32
    init_type: str = "orthogonal"
    pallas_gn: Optional[bool] = None

    @nn.compact
    def __call__(self, x, emb, *, train: bool = False):
        dim = x.shape[-1]
        h = Block(
            self.dim_out, groups=self.norm_groups, dtype=self.dtype,
            init_type=self.init_type, pallas_gn=self.pallas_gn, name="block1",
        )(x, train=train)

        # conditioning is a per-(batch, channel) affine a*h + b — computed
        # here, but *applied inside block2's fused kernel* where it folds
        # into the group statistics with zero extra HBM traffic
        # (ops/conv_fused.py)
        pre_scale = pre_bias = None
        if emb is not None:
            dense = lambda feats, name: nn.Dense(
                feats, dtype=self.dtype,
                kernel_init=_kernel_init(self.init_type), name=name,
            )
            if self.cond_mode == "ddpm":
                # Swish on the embedding, additive bias (ddpm_modules/unet.py:78-96)
                e = nn.swish(emb.astype(jnp.float32)).astype(self.dtype)
                pre_bias = dense(self.dim_out, "cond_proj")(e)
            elif self.use_affine_level:
                gb = dense(2 * self.dim_out, "cond_proj")(emb.astype(self.dtype))
                gamma, beta = jnp.split(gb, 2, axis=-1)
                pre_scale, pre_bias = 1 + gamma, beta
            else:
                pre_bias = dense(self.dim_out, "cond_proj")(
                    emb.astype(self.dtype)
                )

        # the skip is fed into block2's fused kernel (added to the conv
        # output pre-store), saving its separate read-add-write pass
        if dim != self.dim_out:
            x = nn.Conv(
                self.dim_out, (1, 1), dtype=self.dtype,
                kernel_init=_kernel_init(self.init_type), name="res_conv",
            )(x.astype(self.dtype))
        return Block(
            self.dim_out, groups=self.norm_groups, dropout=self.dropout,
            dtype=self.dtype, init_type=self.init_type,
            pallas_gn=self.pallas_gn, name="block2",
        )(h, train=train, pre_scale=pre_scale, pre_bias=pre_bias,
          residual=x)


class SelfAttention(nn.Module):
    """Spatial self-attention with residual (reference unet.py:113-142).

    Single head by default; the softmax scale is 1/sqrt(channel) over the FULL
    channel count even for n_head > 1, matching the reference's quirk
    (sr3_modules/unet.py:132-134).
    """

    n_head: int = 1
    norm_groups: int = 32
    dtype: Any = jnp.float32
    init_type: str = "orthogonal"
    use_flash: Optional[bool] = None
    pallas_gn: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.n_head
        n = GroupNormSwish(num_groups=self.norm_groups, swish=False,
                   use_pallas=self.pallas_gn, name="norm")(x)
        qkv = nn.Conv(
            c * 3, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=_kernel_init(self.init_type), name="qkv",
        )(n.astype(self.dtype))
        # torch layout: heads-major, (q,k,v) within each head
        qkv = qkv.reshape(b, h * w, self.n_head, 3, head_dim)
        qkv = jnp.moveaxis(qkv, 1, 2).reshape(b * self.n_head, h * w, 3, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = self_attention(q, k, v, scale=1.0 / math.sqrt(c),
                             use_flash=self.use_flash)
        out = out.reshape(b, self.n_head, h * w, head_dim)
        out = jnp.moveaxis(out, 1, 2).reshape(b, h, w, c)
        out = nn.Conv(
            c, (1, 1), dtype=self.dtype,
            kernel_init=_kernel_init(self.init_type), name="out",
        )(out.astype(self.dtype))
        return x + out


class ResnetBlocWithAttn(nn.Module):
    dim_out: int
    cond_mode: str = "sr3"
    use_affine_level: bool = False
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: Any = jnp.float32
    init_type: str = "orthogonal"
    use_flash: Optional[bool] = None
    pallas_gn: Optional[bool] = None

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        # `train` is positional so nn.remat can mark it static (argnum 3)
        x = ResnetBlock(
            self.dim_out, cond_mode=self.cond_mode,
            use_affine_level=self.use_affine_level,
            norm_groups=self.norm_groups, dropout=self.dropout,
            dtype=self.dtype, init_type=self.init_type,
            pallas_gn=self.pallas_gn, name="res_block",
        )(x, emb, train=train)
        if self.with_attn:
            x = SelfAttention(
                norm_groups=self.norm_groups, dtype=self.dtype,
                init_type=self.init_type, use_flash=self.use_flash,
                pallas_gn=self.pallas_gn, name="attn",
            )(x)
        return x


class UNet(nn.Module):
    """The denoiser backbone (reference sr3_modules/unet.py:161-259).

    Input/output are NHWC. ``cond`` is the continuous sqrt-gamma noise level
    (sr3) or the float-cast integer timestep (ddpm), shape (b,) or (b,1).
    """

    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_cond_emb: bool = True
    image_size: int = 128
    cond_mode: str = "sr3"
    use_affine_level: bool = False
    dtype: Any = jnp.float32
    init_type: str = "orthogonal"
    use_flash: Optional[bool] = None
    pallas_gn: Optional[bool] = None  # False = no Pallas GN kernels (spatial)
    remat: bool = False  # rematerialize ResnetBlocks: trade FLOPs for HBM

    @nn.compact
    def __call__(self, x, cond, *, train: bool = False):
        assert x.shape[-1] == self.in_channel, (
            f"expected {self.in_channel} input channels (NHWC), got {x.shape}"
        )
        ic = self.inner_channel
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, kernel_init=_kernel_init(self.init_type),
            name=name,
        )

        if self.with_cond_emb:
            e = positional_encoding(cond, ic)
            e = dense(ic * 4, "cond_mlp_dense0")(e.astype(self.dtype))
            e = nn.swish(e)
            emb = dense(ic, "cond_mlp_dense1")(e)
        else:
            emb = None

        # nn.remat: recompute block activations in the backward pass instead
        # of storing them (jax.checkpoint) — enables 512x512 training at
        # batch sizes the reference could not fit (SURVEY §5 long-context
        # note). `train` is a static python bool -> static_argnums.
        block_cls = (
            nn.remat(ResnetBlocWithAttn, static_argnums=(3,))
            if self.remat else ResnetBlocWithAttn
        )
        rba = lambda dim_out, with_attn, name: block_cls(
            dim_out, cond_mode=self.cond_mode,
            use_affine_level=self.use_affine_level,
            norm_groups=self.norm_groups, dropout=self.dropout,
            with_attn=with_attn, dtype=self.dtype, init_type=self.init_type,
            use_flash=self.use_flash, pallas_gn=self.pallas_gn, name=name,
        )

        num_mults = len(self.channel_mults)
        attn_res = tuple(self.attn_res)
        x = x.astype(self.dtype)

        # ----- down path: feats pushed after EVERY layer (reference :235-245)
        layer_idx = 0
        x = nn.Conv(
            ic, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            kernel_init=_kernel_init(self.init_type), name=f"downs_{layer_idx}",
        )(x)
        layer_idx += 1
        feats = [x]
        pre_channel = ic
        now_res = self.image_size
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in attn_res
            channel_mult = ic * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                x = rba(channel_mult, use_attn, f"downs_{layer_idx}")(
                    x, emb, train
                )
                layer_idx += 1
                feats.append(x)
                pre_channel = channel_mult
            if not is_last:
                # Downsample: conv3x3 stride 2, torch padding=1 (unet.py:68-74)
                x = nn.Conv(
                    pre_channel, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    kernel_init=_kernel_init(self.init_type),
                    name=f"downs_{layer_idx}",
                )(x)
                layer_idx += 1
                feats.append(x)
                now_res //= 2

        # ----- mid (reference :210-215)
        x = rba(pre_channel, True, "mid_0")(x, emb, train)
        x = rba(pre_channel, False, "mid_1")(x, emb, train)

        # ----- up path with skip concat (reference :217-231,253-257)
        layer_idx = 0
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in attn_res
            channel_mult = ic * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                skip = feats.pop()
                x = rba(channel_mult, use_attn, f"ups_{layer_idx}")(
                    jnp.concatenate([x, skip], axis=-1), emb, train
                )
                layer_idx += 1
                pre_channel = channel_mult
            if not is_last:
                # Upsample: nearest x2 then conv3x3 (unet.py:58-65)
                b_, h_, w_, c_ = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(
                    pre_channel, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=_kernel_init(self.init_type),
                    name=f"ups_{layer_idx}",
                )(x)
                layer_idx += 1
                now_res *= 2

        out = Block(
            self.out_channel, groups=self.norm_groups, dtype=self.dtype,
            init_type=self.init_type, pallas_gn=self.pallas_gn,
            name="final_conv",
        )(x, train=train)
        return out.astype(jnp.float32)
