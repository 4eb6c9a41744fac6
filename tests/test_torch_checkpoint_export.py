"""Reverse converter: flax params -> reference-loadable torch state_dict.

Completes the migration story in both directions (import is covered by
test_torch_checkpoint_converter.py): weights trained here must load into
the reference with `strict=True` — the exact check its `load_network`
performs (/root/reference/model/model.py:157-158) — and produce identical
forward outputs.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

SMALL = dict(
    in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
    channel_mults=(1, 2), attn_res=(8,), res_blocks=1, image_size=16,
)
MAP_KW = {
    k: SMALL[k]
    for k in ("in_channel", "inner_channel", "channel_mults", "attn_res",
              "res_blocks", "image_size")
}
SCHED = {"schedule": "linear", "n_timestep": 10,
         "linear_start": 1e-6, "linear_end": 1e-2}


def _flax_init(cond_mode):
    import jax

    from sr3_tpu.models.unet import UNet

    ours = UNet(cond_mode=cond_mode, dropout=0, **SMALL)
    params = ours.init(
        {"params": jax.random.PRNGKey(3)},
        np.zeros((1, 16, 16, 6), np.float32),
        np.ones((1,), np.float32),
        train=False,
    )
    return ours, params


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_export_roundtrip(cond_mode):
    """export -> import reproduces the original tree bit-exactly."""
    import jax

    from sr3_tpu.utils.torch_compat import (
        flax_params_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    _, params = _flax_init(cond_mode)
    sd = flax_params_to_torch_state_dict(
        params, schedule_opt=SCHED, cond_mode=cond_mode, **MAP_KW
    )
    back = torch_state_dict_to_flax(sd, cond_mode=cond_mode, **MAP_KW)
    orig = jax.tree_util.tree_leaves_with_path(params)
    rt = jax.tree_util.tree_leaves_with_path(back)
    assert [jax.tree_util.keystr(p) for p, _ in orig] == [
        jax.tree_util.keystr(p) for p, _ in rt
    ]
    for (_, a), (_, b) in zip(orig, rt):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)


def _import_ref(cond_mode, module):
    import importlib

    sys.path.insert(0, os.path.join(REF, "model", f"{cond_mode}_modules"))
    try:
        mod = importlib.import_module(module)
        importlib.reload(mod)
        return mod
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_export_strict_loads_into_reference(cond_mode):
    """The exported dict satisfies the reference's strict load — every key
    it registers (UNet params, inv_freq, 12 schedule buffers) present with
    the right shape, nothing extra — and the loaded reference UNet matches
    the flax forward."""
    from sr3_tpu.utils.torch_compat import flax_params_to_torch_state_dict

    ours, params = _flax_init(cond_mode)
    sd = flax_params_to_torch_state_dict(
        params, schedule_opt=SCHED, cond_mode=cond_mode, **MAP_KW
    )

    ref_unet = _import_ref(cond_mode, "unet")
    ref_diff_mod = _import_ref(cond_mode, "diffusion")
    emb_kw = (
        {"with_noise_level_emb": True} if cond_mode == "sr3"
        else {"with_time_emb": True}
    )
    torch.manual_seed(0)
    net = ref_unet.UNet(dropout=0, **SMALL, **emb_kw)
    ref = ref_diff_mod.GaussianDiffusion(
        net, image_size=16, channels=3, loss_type="l1", conditional=True
    )
    ref.set_new_noise_schedule(SCHED, torch.device("cpu"))

    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    ref.eval()

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 16, 16, 6), dtype=np.float32)
    cond = (
        np.asarray([0.3, 0.8], np.float32)
        if cond_mode == "sr3"
        else np.asarray([3.0, 7.0], np.float32)
    )
    with torch.no_grad():
        x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        c_t = (
            torch.from_numpy(cond.reshape(-1, 1))
            if cond_mode == "sr3"
            else torch.from_numpy(cond)
        )
        out_ref = np.transpose(ref.denoise_fn(x_t, c_t).numpy(), (0, 2, 3, 1))
    out_ours = np.asarray(ours.apply(params, x, cond, train=False))
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=1e-3)


def test_export_schedule_buffers_match_reference():
    """Baked-in buffers equal what set_new_noise_schedule registers."""
    from sr3_tpu.utils.torch_compat import flax_params_to_torch_state_dict

    _, params = _flax_init("sr3")
    sd = flax_params_to_torch_state_dict(
        params, schedule_opt=SCHED, cond_mode="sr3", **MAP_KW
    )
    ref_unet = _import_ref("sr3", "unet")
    ref_diff_mod = _import_ref("sr3", "diffusion")
    net = ref_unet.UNet(dropout=0, **SMALL, with_noise_level_emb=True)
    ref = ref_diff_mod.GaussianDiffusion(
        net, image_size=16, channels=3, loss_type="l1", conditional=True
    )
    ref.set_new_noise_schedule(SCHED, torch.device("cpu"))
    ref_sd = ref.state_dict()
    for k in ("betas", "posterior_variance", "posterior_mean_coef1",
              "posterior_log_variance_clipped", "sqrt_recipm1_alphas_cumprod"):
        np.testing.assert_allclose(sd[k], ref_sd[k].numpy(), atol=1e-7)
