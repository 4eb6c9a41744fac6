"""Torch .pth checkpoint interop.

Converts reference state_dicts (model/sr3_modules/unet.py UNet, saved by
model/model.py:124-144) into this framework's flax param trees, so published
weights can be loaded and numerical parity validated.

The reference registers its layers in flat ModuleLists (downs/mid/ups) whose
indices we mirror in flax module names (downs_{i}, mid_{i}, ups_{i}); this
module replays the reference's construction loop (sr3_modules/unet.py:189-233)
to enumerate (flax_path, torch_prefix, kind) triplets.

Schedule buffers present in the .pth (betas, alphas_cumprod, ..., registered
at sr3_modules/diffusion.py:110-139) are dropped — schedules are recomputed
from config (SURVEY §7 'checkpoint converter' note). A 'denoise_fn.' or
'module.' (DataParallel) key prefix is stripped.
"""

from __future__ import annotations

import numpy as np


def _conv(flax_path, torch_prefix, bias=True):
    out = [(flax_path + ("kernel",), torch_prefix + ".weight", "conv_w")]
    if bias:
        out.append((flax_path + ("bias",), torch_prefix + ".bias", "copy"))
    return out


def _linear(flax_path, torch_prefix):
    return [
        (flax_path + ("kernel",), torch_prefix + ".weight", "linear_w"),
        (flax_path + ("bias",), torch_prefix + ".bias", "copy"),
    ]


def _gn(flax_path, torch_prefix):
    return [
        (flax_path + ("scale",), torch_prefix + ".weight", "copy"),
        (flax_path + ("bias",), torch_prefix + ".bias", "copy"),
    ]


def _resnet_block(flax_path, torch_prefix, cond_mode, has_res_conv):
    """ResnetBlock: block1/block2 (Sequential GN,Swish,Dropout,Conv — conv at
    index 3), conditioning projection, optional res_conv."""
    m = []
    for blk in ("block1", "block2"):
        m += _gn(flax_path + (blk, "norm"), f"{torch_prefix}.{blk}.block.0")
        m += _conv(flax_path + (blk, "conv"), f"{torch_prefix}.{blk}.block.3")
    if cond_mode == "ddpm":
        # mlp = Sequential(Swish, Linear) (ddpm_modules/unet.py:81-84)
        m += _linear(flax_path + ("cond_proj",), f"{torch_prefix}.mlp.1")
    else:
        # noise_func = FeatureWiseAffine(Sequential(Linear))
        m += _linear(
            flax_path + ("cond_proj",), f"{torch_prefix}.noise_func.noise_func.0"
        )
    if has_res_conv:
        m += _conv(flax_path + ("res_conv",), f"{torch_prefix}.res_conv")
    return m


def _attn(flax_path, torch_prefix):
    m = _gn(flax_path + ("norm",), f"{torch_prefix}.norm")
    m += _conv(flax_path + ("qkv",), f"{torch_prefix}.qkv", bias=False)
    m += _conv(flax_path + ("out",), f"{torch_prefix}.out")
    return m


def build_key_map(in_channel=6, inner_channel=64, channel_mults=(1, 2, 4, 8, 8),
                  attn_res=(16,), res_blocks=2, image_size=128,
                  cond_mode="sr3", with_cond_emb=True):
    """Replay the reference UNet construction to map every parameter."""
    m = []
    if with_cond_emb:
        prefix = "noise_level_mlp" if cond_mode == "sr3" else "time_mlp"
        m += _linear(("cond_mlp_dense0",), f"{prefix}.1")
        m += _linear(("cond_mlp_dense1",), f"{prefix}.3")

    num_mults = len(channel_mults)
    attn_res = tuple(attn_res or ())

    # down path
    idx = 0
    m += _conv((f"downs_{idx}",), f"downs.{idx}")
    idx += 1
    pre = inner_channel
    feat_channels = [pre]
    now_res = image_size
    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        use_attn = now_res in attn_res
        ch = inner_channel * channel_mults[ind]
        for _ in range(res_blocks):
            base = (f"downs_{idx}",)
            m += _resnet_block(
                base + ("res_block",), f"downs.{idx}.res_block",
                cond_mode, has_res_conv=(pre != ch),
            )
            if use_attn:
                m += _attn(base + ("attn",), f"downs.{idx}.attn")
            idx += 1
            feat_channels.append(ch)
            pre = ch
        if not is_last:
            m += _conv((f"downs_{idx}",), f"downs.{idx}.conv")
            idx += 1
            feat_channels.append(pre)
            now_res //= 2

    # mid
    m += _resnet_block(("mid_0", "res_block"), "mid.0.res_block",
                       cond_mode, has_res_conv=False)
    m += _attn(("mid_0", "attn"), "mid.0.attn")
    m += _resnet_block(("mid_1", "res_block"), "mid.1.res_block",
                       cond_mode, has_res_conv=False)

    # up path
    idx = 0
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        use_attn = now_res in attn_res
        ch = inner_channel * channel_mults[ind]
        for _ in range(res_blocks + 1):
            cat_in = pre + feat_channels.pop()
            base = (f"ups_{idx}",)
            m += _resnet_block(
                base + ("res_block",), f"ups.{idx}.res_block",
                cond_mode, has_res_conv=(cat_in != ch),
            )
            if use_attn:
                m += _attn(base + ("attn",), f"ups.{idx}.attn")
            idx += 1
            pre = ch
        if not is_last:
            m += _conv((f"ups_{idx}",), f"ups.{idx}.conv")
            idx += 1
            now_res *= 2

    # final block (GN at .block.0, conv at .block.3)
    m += _gn(("final_conv", "norm"), "final_conv.block.0")
    m += _conv(("final_conv", "conv"), "final_conv.block.3")
    return m


_SCHEDULE_BUFFERS = (
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2",
)


def flax_params_to_torch_state_dict(params, schedule_opt=None, **unet_config):
    """Inverse of `torch_state_dict_to_flax`: export this framework's flax
    params as a state_dict loadable by the reference with `strict=True`.

    Emits exactly what the reference's `save_network` writes
    (/root/reference/model/model.py:124-136 — the GaussianDiffusion
    state_dict): every UNet parameter under a `denoise_fn.` prefix (layouts
    transposed back to torch conventions), the ddpm TimeEmbedding `inv_freq`
    buffer (ddpm_modules/unet.py:19-27), and — when `schedule_opt` is given —
    the 12 schedule buffers `set_new_noise_schedule` registers
    (sr3_modules/diffusion.py:110-139), recomputed from the schedule config
    exactly as the reference does (float64 numpy, cast to float32).

    Returns {key: np.ndarray}; pass through `torch.tensor` /
    `torch.save` for an `I{iter}_E{epoch}_gen.pth` the reference loads as a
    resume_state (val phase) or pretrained model.
    """
    tree = params.get("params", params)

    def _leaf(path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    sd = {}
    for flax_path, torch_key, kind in build_key_map(**unet_config):
        w = _leaf(flax_path)
        if kind == "conv_w":  # (kh,kw,in,out) -> (out,in,kh,kw)
            w = np.transpose(w, (3, 2, 0, 1))
        elif kind == "linear_w":  # (in,out) -> (out,in)
            w = np.transpose(w, (1, 0))
        sd["denoise_fn." + torch_key] = np.ascontiguousarray(
            w, dtype=np.float32
        )

    if unet_config.get("cond_mode", "sr3") == "ddpm":
        dim = unet_config.get("inner_channel", 64)
        sd["denoise_fn.time_mlp.0.inv_freq"] = np.exp(
            np.arange(0, dim, 2, dtype=np.float32) * (-np.log(10000.0) / dim)
        ).astype(np.float32)

    if schedule_opt is not None:
        from sr3_tpu.models.schedule import make_beta_schedule

        betas = np.asarray(
            make_beta_schedule(
                schedule=schedule_opt["schedule"],
                n_timestep=schedule_opt["n_timestep"],
                linear_start=schedule_opt["linear_start"],
                linear_end=schedule_opt["linear_end"],
            ),
            dtype=np.float64,
        )
        alphas = 1.0 - betas
        cum = np.cumprod(alphas, axis=0)
        cum_prev = np.append(1.0, cum[:-1])
        post_var = betas * (1.0 - cum_prev) / (1.0 - cum)
        buffers = {
            "betas": betas,
            "alphas_cumprod": cum,
            "alphas_cumprod_prev": cum_prev,
            "sqrt_alphas_cumprod": np.sqrt(cum),
            "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - cum),
            "log_one_minus_alphas_cumprod": np.log(1.0 - cum),
            "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / cum),
            "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / cum - 1.0),
            "posterior_variance": post_var,
            "posterior_log_variance_clipped": np.log(
                np.maximum(post_var, 1e-20)
            ),
            "posterior_mean_coef1": betas * np.sqrt(cum_prev) / (1.0 - cum),
            "posterior_mean_coef2": (1.0 - cum_prev)
            * np.sqrt(alphas)
            / (1.0 - cum),
        }
        for k, v in buffers.items():
            sd[k] = v.astype(np.float32)
    return sd


def torch_state_dict_to_flax(state_dict, **unet_config):
    """state_dict (torch tensors or numpy) -> flax params {'params': tree}."""
    sd = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "denoise_fn."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        if k.split(".")[0] in _SCHEDULE_BUFFERS or k == "inv_freq" or \
                k.endswith(".inv_freq"):
            continue
        # np.array (copy) — torch .numpy() views share storage with the
        # live module; an in-place optimizer step would silently mutate
        # the "transferred" params after the fact.
        sd[k] = np.array(getattr(v, "numpy", lambda: v)())

    key_map = build_key_map(**unet_config)
    tree = {}
    used = set()
    for flax_path, torch_key, kind in key_map:
        if torch_key not in sd:
            raise KeyError(f"missing torch key {torch_key} for {flax_path}")
        w = sd[torch_key]
        used.add(torch_key)
        if kind == "conv_w":  # (out,in,kh,kw) -> (kh,kw,in,out)
            w = np.transpose(w, (2, 3, 1, 0))
        elif kind == "linear_w":  # (out,in) -> (in,out)
            w = np.transpose(w, (1, 0))
        node = tree
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = w

    leftover = set(sd) - used
    if leftover:
        raise KeyError(f"unconverted torch keys: {sorted(leftover)[:8]}...")
    return {"params": tree}
