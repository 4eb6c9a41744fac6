"""CLI test for tools/sampler_eval.py (the sampler-requal measurement).

Drives main() in-process on a micro model (16x16 imgs, T=4) with a
checkpoint saved in-test, and checks the artifact schema the round-5
requal relies on: [image][rep] score grids, mean/SE aggregation, and the
paired per-chain deltas vs the first (baseline) sampler.
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

from sr3_tpu.parallel.mesh import create_mesh
from sr3_tpu.training.trainer import Trainer
from sr3_tpu.utils.config import dict_to_nonedict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# not quick-marked: two Trainer builds compile two sampler chains (~2-3 min
# on the 1-core host) — integration-tier cost, like test_drivers.py


def _write_dataset(root, n=2):
    os.makedirs(root / "hr_16")
    os.makedirs(root / "sr_2_16")
    os.makedirs(root / "lr_2")
    rng = np.random.default_rng(0)
    for i in range(n):
        for d, size in (("hr_16", 16), ("sr_2_16", 16), ("lr_2", 2)):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / d / f"{i:05d}.png")


def _opt_dict(tmp_path):
    sched = {"schedule": "linear", "n_timestep": 4,
             "linear_start": 1e-6, "linear_end": 1e-2}
    return {
        "name": "sampler_eval_test",
        "phase": "train",
        "seed": 0,
        "path": {"checkpoint": str(tmp_path / "ckpt"), "resume_state": None},
        "datasets": {
            "val": {
                "name": "micro", "mode": "LRHR",
                "dataroot": str(tmp_path / "data"),
                "datatype": "img", "l_resolution": 2, "r_resolution": 16,
                "data_len": 2,
            }
        },
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "dtype": "float32",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": 8,
                "norm_groups": 4, "channel_multiplier": [1, 2],
                "attn_res": [], "res_blocks": 1, "dropout": 0.0,
            },
            "beta_schedule": {"train": sched, "val": sched},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {"optimizer": {"type": "adam", "lr": 1e-3}},
    }


def test_sampler_eval_cli(tmp_path, monkeypatch, capsys):
    _write_dataset(tmp_path / "data")
    os.makedirs(tmp_path / "ckpt")
    opt = _opt_dict(tmp_path)

    t = Trainer(dict_to_nonedict(dict(opt)), mesh=create_mesh(num_data=1))
    t.save_network(epoch=0, iter_step=0)
    prefixes = [p[: -len("_gen")] for p in os.listdir(tmp_path / "ckpt")
                if p.endswith("_gen")]
    assert len(prefixes) == 1
    resume = str(tmp_path / "ckpt" / prefixes[0])

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps(opt))
    out = tmp_path / "requal.json"

    import sampler_eval
    monkeypatch.setattr(sys, "argv", [
        "sampler_eval.py", "--config", str(cfg), "--resume", resume,
        "--samplers", "ddpm:4", "ddim:2", "--eta", "1.0",
        "--reps", "2", "--out", str(out),
    ])
    sampler_eval.main()

    report = json.loads(out.read_text())
    assert report["val_timesteps"] == 4
    rows = report["results"]
    assert [r["sampler"] for r in rows] == ["ddpm:4", "ddim:2"]

    base, ddim = rows
    assert base["nfe"] == 4 and ddim["nfe"] == 2
    for r in rows:
        grid = np.asarray(r["psnr_db"])
        assert grid.shape == (2, 2)  # [image][rep]
        assert np.isfinite(grid).all()
        sgrid = np.asarray(r["ssim"])
        assert sgrid.shape == (2, 2)
        assert (sgrid <= 1.0).all() and (sgrid >= -1.0).all()
        assert r["avg_psnr_db"] == pytest.approx(grid.mean(), abs=0.01)
        assert r["se_psnr_db"] >= 0

    # paired deltas exist only on non-first rows, and match the grids
    assert "d_psnr_vs_first" not in base
    dp = np.asarray(ddim["psnr_db"]) - np.asarray(base["psnr_db"])
    assert ddim["d_psnr_vs_first"] == pytest.approx(dp.mean(), abs=0.01)
    # cluster-robust SE: per-image mean deltas, ddof=1 over images
    pi = dp.mean(axis=1)
    assert ddim["d_psnr_se_cluster"] == pytest.approx(
        pi.std(ddof=1) / np.sqrt(2), abs=0.01)
    assert "d_ssim_se_cluster" in ddim
    assert ddim["d_ssim_vs_first"] == pytest.approx(
        (np.asarray(ddim["ssim"]) - np.asarray(base["ssim"])).mean(),
        abs=1e-3)

    # stdout mirrors the rows (one JSON line per sampler)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2

    # a non-ddpm spec without :steps must refuse up front (it would
    # otherwise inherit the previous sampler's steps and record nfe=0)
    import sampler_eval
    monkeypatch.setattr(sys, "argv", [
        "sampler_eval.py", "--config", str(cfg), "--resume", resume,
        "--samplers", "dpm++",
    ])
    with pytest.raises(SystemExit):
        sampler_eval.main()
