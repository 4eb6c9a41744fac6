"""Integration: reference .pth -> converter -> Trainer resume -> inference.

Covers the published-weights path end to end (tools/convert_torch_checkpoint
semantics, minus the CLI wrapper)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def test_pth_to_resume_state_roundtrip(tmp_path):
    import orbax.checkpoint as ocp

    from sr3_tpu.parallel.mesh import create_mesh
    from sr3_tpu.training.trainer import Trainer
    from sr3_tpu.utils.config import dict_to_nonedict
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    sys.path.insert(0, os.path.join(REF, "model", "sr3_modules"))
    try:
        import importlib

        import unet as ref_unet

        importlib.reload(ref_unet)
        torch.manual_seed(0)
        net = ref_unet.UNet(
            in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
            channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
            image_size=16,
        )
    finally:
        sys.path.pop(0)

    # simulate the published artifact: DataParallel-style prefixed state dict
    sd = {"module." + k: v.detach() for k, v in net.state_dict().items()}
    params = torch_state_dict_to_flax(
        sd, in_channel=6, inner_channel=16, channel_mults=(1, 2),
        attn_res=(8,), res_blocks=1, image_size=16, cond_mode="sr3",
    )
    prefix = str(tmp_path / "I5_E1")
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(prefix + "_gen"), {"params": params}, force=True
    )

    opt = dict_to_nonedict({
        "phase": "val",
        "path": {"checkpoint": str(tmp_path), "resume_state": prefix},
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "dtype": "float32",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": 16,
                "norm_groups": 8, "channel_multiplier": [1, 2],
                "attn_res": [8], "res_blocks": 1, "dropout": 0,
            },
            "beta_schedule": {
                "val": {"schedule": "linear", "n_timestep": 5,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {},
    })
    t = Trainer(opt, mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    t.feed_data({
        "HR": np.zeros((1, 16, 16, 3), np.float32),
        "SR": np.zeros((1, 16, 16, 3), np.float32),
    })
    t.test(continous=False)
    assert t.output.shape == (1, 16, 16, 3)
    assert np.isfinite(t.output).all()

    # and the loaded params match the torch weights (spot check the stem conv)
    import jax

    loaded = jax.device_get(t.state.params)["params"]["downs_0"]["kernel"]
    expected = np.transpose(
        net.state_dict()["downs.0.weight"].numpy(), (2, 3, 1, 0)
    )
    np.testing.assert_allclose(loaded, expected, atol=1e-6)
