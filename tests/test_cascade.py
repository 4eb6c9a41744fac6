"""Cascade pipeline: unconditional seed stage -> conditional SR stage, the
chaining the reference README lists results for but ships no driver for."""

import numpy as np
import pytest

from sr3_tpu.training.cascade import run_cascade, run_stage, to_condition
from sr3_tpu.utils.config import dict_to_nonedict


def _stage_opt(tmp_path, name, size, conditional):
    return dict_to_nonedict({
        "name": name,
        "phase": "val",
        "seed": 0,
        "path": {
            "checkpoint": str(tmp_path / name / "ckpt"),
            "resume_state": None,
        },
        "datasets": {"val": {"batch_size": 2, "r_resolution": size}},
        "model": {
            "which_model_G": "sr3" if conditional else "ddpm",
            "finetune_norm": False,
            "dtype": "float32",
            "unet": {
                "in_channel": 6 if conditional else 3, "out_channel": 3,
                "inner_channel": 8, "norm_groups": 4,
                "channel_multiplier": [1, 2], "attn_res": [4],
                "res_blocks": 1, "dropout": 0.0,
            },
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 8,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 4,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": size, "channels": 3,
                          "conditional": conditional},
        },
        "train": {
            "n_iter": 1,
            "optimizer": {"type": "adam", "lr": 1e-3},
        },
    })


def test_to_condition_resizes_to_stage_size():
    img = np.random.default_rng(0).uniform(-1, 1, (8, 8, 3)).astype(
        np.float32)
    cond = to_condition(img, 16)
    assert cond.shape == (16, 16, 3)
    assert cond.min() >= -1.0 and cond.max() <= 1.0
    # bicubic upsample of a constant image stays (quantized-)constant
    flat = to_condition(np.full((8, 8, 3), 0.25, np.float32), 16)
    assert float(np.ptp(flat)) < 1e-6


def test_uncond_seed_then_sr_stage(tmp_path):
    opts = [
        _stage_opt(tmp_path, "seed8", 8, conditional=False),
        _stage_opt(tmp_path, "sr8_16", 16, conditional=True),
    ]
    out_dir = tmp_path / "out"
    images = run_cascade(opts, n_samples=3, out_dir=str(out_dir))
    assert len(images) == 3
    assert all(img.shape == (16, 16, 3) for img in images)
    # per-stage and final PNGs written
    names = {p.name for p in out_dir.iterdir()}
    assert {"1_1_8.png", "2_1_16.png", "final_1.png"} <= names


def test_conditional_stage_from_input_images(tmp_path):
    opt = _stage_opt(tmp_path, "sr_only", 16, conditional=True)
    inputs = [np.random.default_rng(i).uniform(-1, 1, (8, 8, 3)).astype(
        np.float32) for i in range(2)]
    outs = run_stage(opt, images=inputs)
    assert len(outs) == 2 and outs[0].shape == (16, 16, 3)


def test_conditional_stage_without_inputs_raises(tmp_path):
    opt = _stage_opt(tmp_path, "sr_noin", 16, conditional=True)
    with pytest.raises(ValueError):
        run_stage(opt, images=None)
