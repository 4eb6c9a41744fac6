"""Factory: every shipped config builds a working model (shrunk spatially
for CPU speed) and maps config keys correctly."""

import os

import jax
import jax.numpy as jnp
import pytest

from sr3_tpu.models.networks import define_G, init_params
from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _load(name):
    opt = dict_to_nonedict(load_json_with_comments(os.path.join(CFG_DIR, name)))
    # shrink for CPU: tiny image, thin channels — structure knobs untouched
    opt["model"]["unet"]["inner_channel"] = 8
    opt["model"]["unet"]["norm_groups"] = 4
    opt["model"]["unet"]["channel_multiplier"] = [1, 2]
    opt["model"]["diffusion"]["image_size"] = 16
    opt["model"]["unet"]["attn_res"] = [8]
    opt["model"]["dtype"] = "float32"
    opt["phase"] = "val"
    return opt


@pytest.mark.parametrize("name", [
    "sr_sr3_16_128.json", "sr_ddpm_16_128.json", "sr_sr3_64_512.json",
    "sr_sr3_64_512_attn.json", "sr_sr3_128_1024.json",
    "sample_sr3_128.json", "sample_ddpm_128.json",
])
def test_config_builds_and_runs(name):
    opt = _load(name)
    diffusion = define_G(opt)
    assert diffusion.cond_mode == opt["model"]["which_model_G"]
    assert diffusion.conditional == opt["model"]["diffusion"]["conditional"]
    params = init_params(diffusion, jax.random.PRNGKey(0))
    cin = opt["model"]["unet"]["in_channel"]
    out = diffusion.denoise_fn.apply(
        params, jnp.zeros((1, 16, 16, cin)), jnp.ones((1,)), train=False
    )
    assert out.shape == (1, 16, 16, opt["model"]["unet"]["out_channel"])


def test_remat_flag_from_config():
    opt = _load("sr_sr3_64_512.json")
    assert opt["model"]["unet"]["remat"] is True
    diffusion = define_G(opt)
    assert diffusion.denoise_fn.remat is True
    # remat model must still train (grad through nn.remat)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    g = jax.grad(
        lambda p: jnp.sum(
            diffusion.denoise_fn.apply(
                p, jnp.zeros((1, 16, 16, 6)), jnp.ones((1,)), train=False
            ) ** 2
        )
    )(params)
    assert all(
        jnp.isfinite(x).all() for x in jax.tree_util.tree_leaves(g)
    )


def test_attn_512_config_enables_attention():
    """The attn config keeps attention ON at 512^2 feature maps — the
    capability the reference disabled (config/sr_sr3_64_512.json
    attn_res=[], README.md:45). Since round 5 the kernel choice is left to
    the auto policy (docs/BENCH512_r05.json: XLA measurably faster at
    1k/4k tokens, Pallas flash load-bearing from 8k), so the config must
    NOT pin use_flash."""
    opt = dict_to_nonedict(load_json_with_comments(
        os.path.join(CFG_DIR, "sr_sr3_64_512_attn.json")))
    assert opt["model"]["unet"]["attn_res"] == [32, 64]
    assert opt["model"]["unet"]["use_flash"] is None
    assert opt["model"]["unet"]["remat"] is True
    opt["model"]["dtype"] = "float32"
    opt["phase"] = "val"
    diffusion = define_G(opt)
    assert diffusion.denoise_fn.use_flash is None
    assert diffusion.denoise_fn.attn_res == (32, 64)
