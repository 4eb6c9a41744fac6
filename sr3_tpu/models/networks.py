"""Network factory: config dict -> (UNet, GaussianDiffusion).

Mirrors the reference's define_G (model/networks.py:83-116): module-pair
selection by ``which_model_G`` becomes the ``cond_mode`` switch on the single
parameterized UNet/diffusion; ``norm_groups`` defaults to 32; loss is 'l1' by
default but exposed via config (the reference hardcoded it at the factory,
model/networks.py:106 — SURVEY §7 quirk list says expose it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sr3_tpu.models.diffusion import GaussianDiffusion
from sr3_tpu.models.unet import UNet

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def resolve_dtype(name=None):
    """Compute dtype: bf16 on TPU by default (MXU-native), f32 elsewhere."""
    if name:
        return _DTYPES[name]
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def define_G(opt, pallas_gn=None) -> GaussianDiffusion:
    """Build the diffusion model from a parsed config.

    ``pallas_gn=False`` constructs the UNet with all Pallas GN kernels
    disabled (per-model, not process-global) — required under spatial
    ('space' axis) activation sharding where a pallas_call would force
    GSPMD to all-gather the H-sharded activation.
    """
    model_opt = opt["model"]
    cond_mode = model_opt["which_model_G"]  # 'sr3' | 'ddpm'
    unet_opt = model_opt["unet"]
    diff_opt = model_opt["diffusion"]

    if ("norm_groups" not in unet_opt) or unet_opt["norm_groups"] is None:
        norm_groups = 32
    else:
        norm_groups = unet_opt["norm_groups"]

    init_type = "orthogonal" if opt.get("phase") == "train" else "default"

    unet = UNet(
        in_channel=unet_opt["in_channel"],
        out_channel=unet_opt["out_channel"],
        inner_channel=unet_opt["inner_channel"],
        norm_groups=norm_groups,
        channel_mults=tuple(unet_opt["channel_multiplier"]),
        attn_res=tuple(unet_opt["attn_res"] or ()),
        res_blocks=unet_opt["res_blocks"],
        dropout=unet_opt.get("dropout", 0.0) or 0.0,
        image_size=diff_opt["image_size"],
        cond_mode=cond_mode,
        dtype=resolve_dtype(model_opt.get("dtype")),
        init_type=init_type,
        remat=bool(unet_opt.get("remat", False)),
        use_flash=unet_opt.get("use_flash"),  # None = auto by seq length
        pallas_gn=pallas_gn,
    )
    return GaussianDiffusion(
        unet,
        image_size=diff_opt["image_size"],
        channels=diff_opt.get("channels", 3) or 3,
        loss_type=diff_opt.get("loss_type", "l1") or "l1",
        conditional=diff_opt["conditional"],
        cond_mode=cond_mode,
    )


def init_params(diffusion: GaussianDiffusion, rng):
    """Initialize UNet params with a dummy batch (static shapes).

    The init is wrapped in jax.jit: un-jitted flax init executes each
    initializer as its own dispatch — hundreds of tunnel round-trips on a
    remote chip (measured 280 s for the 97.8M flagship, vs ~30 s compiled
    once and ~2 s from the persistent compile cache thereafter)."""
    unet = diffusion.denoise_fn
    x = jnp.zeros(
        (1, diffusion.image_size, diffusion.image_size, unet.in_channel),
        jnp.float32,
    )
    cond = jnp.ones((1,), jnp.float32)
    return jax.jit(
        lambda r: unet.init({"params": r}, x, cond, train=False)
    )(rng)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
