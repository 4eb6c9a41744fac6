"""One-command published-weights validator (tools/validate_pth.py).

In-environment rehearsal of the pretrained-checkpoint workflow the reference
documents at README.md:60-91: export a framework-initialized UNet as a
`*_gen.pth` (exactly what the reference's save_network writes,
model/model.py:124-136), then drive the validator end-to-end — convert,
forward parity vs the reference torch UNet, full diffusion chain on a val
directory pair, PSNR/SSIM scoring, JSON report.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

TINY = {
    "name": "validate_tiny",
    "phase": "val",
    "path": {"log": "logs", "results": "results", "checkpoint": "checkpoint",
             "resume_state": None},
    "datasets": {
        "val": {"name": "val_set", "mode": "LRHR", "dataroot": "SET_BY_TEST",
                "datatype": "img", "l_resolution": 8, "r_resolution": 16,
                "data_len": -1},
    },
    "model": {
        "which_model_G": "sr3",
        "finetune_norm": False,
        "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 16,
                 "norm_groups": 8, "channel_multiplier": [1, 2],
                 "attn_res": [8], "res_blocks": 1, "dropout": 0},
        "beta_schedule": {
            "val": {"schedule": "linear", "n_timestep": 4,
                    "linear_start": 1e-4, "linear_end": 5e-2},
        },
        "diffusion": {"image_size": 16, "channels": 3, "conditional": True},
    },
}

MAP_KW = dict(in_channel=6, inner_channel=16, channel_mults=(1, 2),
              attn_res=(8,), res_blocks=1, image_size=16, cond_mode="sr3")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Config JSON + val pair dirs + an exported tiny *_gen.pth."""
    import jax

    from sr3_tpu.utils import metrics
    from sr3_tpu.utils.torch_compat import flax_params_to_torch_state_dict
    from sr3_tpu.models.unet import UNet

    root = tmp_path_factory.mktemp("validate_pth")
    data = root / "val"
    (data / "sr_8_16").mkdir(parents=True)
    (data / "hr_16").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        for d in ("sr_8_16", "hr_16"):
            img = rng.integers(0, 256, (16, 16, 3), np.uint8)
            metrics.save_img(img, str(data / d / f"{i}_{i}.png"))

    cfg = dict(TINY)
    cfg["datasets"] = {"val": dict(TINY["datasets"]["val"],
                                   dataroot=str(data))}
    cfg_path = root / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))

    net = UNet(cond_mode="sr3", in_channel=6, out_channel=3,
               inner_channel=16, norm_groups=8, channel_mults=(1, 2),
               attn_res=(8,), res_blocks=1, dropout=0, image_size=16)
    params = net.init({"params": jax.random.PRNGKey(7)},
                      np.zeros((1, 16, 16, 6), np.float32),
                      np.ones((1,), np.float32), train=False)
    sd = flax_params_to_torch_state_dict(
        params,
        schedule_opt={"schedule": "linear", "n_timestep": 4,
                      "linear_start": 1e-4, "linear_end": 5e-2},
        **MAP_KW,
    )
    pth = root / "I1_E1_gen.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(pth))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return {"root": root, "cfg": str(cfg_path), "data": str(data),
            "pth": str(pth), "n_params": n_params}


def test_full_pipeline(workspace):
    """convert -> parity vs the reference UNet -> 4-step chain -> scores."""
    from tools.validate_pth import main

    out = str(workspace["root"] / "report.json")
    report = main([
        workspace["pth"], "--config", workspace["cfg"],
        "--data", workspace["data"], "--batch", "2", "--out", out,
        "--save-images", str(workspace["root"] / "imgs"),
    ])

    assert report["n_params"] == workspace["n_params"]
    # reference repo is mounted in this image: parity must actually run
    if os.path.isdir(os.environ.get("SR3_REFERENCE_ROOT", "/root/reference")):
        assert isinstance(report["parity"], dict)
        assert report["parity"]["rel_err"] < 5e-3, report["parity"]
    assert report["timesteps"] == 4
    assert report["n_images"] == 3  # batch 2 + padded tail chunk of 1
    assert len(report["per_image"]) == 3
    assert np.isfinite(report["avg_psnr"])
    # untrained net vs random HR: SSIM may be slightly negative
    assert -1.0 <= report["avg_ssim"] <= 1.0

    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk["avg_psnr"] == report["avg_psnr"]
    imgs = sorted(os.listdir(workspace["root"] / "imgs"))
    assert imgs == ["0_0_sr.png", "1_1_sr.png", "2_2_sr.png"]


def test_prefix_and_limit(workspace):
    """`module.`-prefixed (DataParallel) dicts convert; --limit/--no-parity
    and --timesteps override are honored."""
    sd = torch.load(workspace["pth"], map_location="cpu", weights_only=True)
    wrapped = {"module." + k: v for k, v in sd.items()}
    pth2 = str(workspace["root"] / "wrapped_gen.pth")
    torch.save(wrapped, pth2)

    from tools.validate_pth import main

    report = main([
        pth2, "--config", workspace["cfg"], "--data", workspace["data"],
        "--batch", "1", "--limit", "1", "--timesteps", "2", "--no-parity",
    ])
    assert report["parity"] == "skipped (--no-parity)"
    assert report["n_params"] == workspace["n_params"]
    assert report["timesteps"] == 2
    assert report["n_images"] == 1
