"""End-to-end driver tests: the four CLIs run as real subprocesses.

The reference's only integration test was its debug-mode smoke workflow —
train a few steps, validate, checkpoint (core/logger.py:62-70, SURVEY §4).
This formalizes that as pytest: sr.py train -> sr.py val (resume from the
produced checkpoint) -> infer.py -> eval.py, on CPU over the bundled
fixture dataset with a tiny model, asserting each driver's observable
outputs (logs, checkpoints, result PNGs, scores).
"""

import glob
import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "dataset", "fixtures_16_128")


def _config(resume_state=None):
    """Tiny-model config over the bundled 16->128 fixtures (T=10)."""
    return {
        "name": "e2e",
        "phase": "train",
        "gpu_ids": [0],
        "path": {
            "log": "logs",
            "tb_logger": "tb_logger",
            "results": "results",
            "checkpoint": "checkpoint",
            "resume_state": resume_state,
        },
        "datasets": {
            "train": {
                "name": "FIX", "mode": "HR", "dataroot": FIXTURES,
                "datatype": "img", "l_resolution": 16, "r_resolution": 128,
                "batch_size": 2, "num_workers": 0, "use_shuffle": True,
                "data_len": -1,
            },
            "val": {
                "name": "FIX", "mode": "LRHR", "dataroot": FIXTURES,
                "datatype": "img", "l_resolution": 16, "r_resolution": 128,
                "data_len": 2,
            },
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
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 10,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 128, "channels": 3,
                          "conditional": True},
        },
        "train": {
            "n_iter": 4, "val_freq": 2, "save_checkpoint_freq": 2,
            "print_freq": 1,
            "optimizer": {"type": "adam", "lr": 1e-4},
        },
        "wandb": {"project": "e2e"},
    }


def _run(script, workdir, *args, timeout=600):
    """Run a driver as a subprocess from a scratch cwd, CPU backend."""
    env = dict(os.environ)
    env["SR3_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO
    # the pytest process forces an 8-device CPU host; drivers get 1 device
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=workdir, env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed ({proc.returncode}):\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )
    return proc


def test_driver_cycle(tmp_path):
    # --- 1. sr.py train: 4 steps, val at 2/4, checkpoint at 2/4 ---------
    cfg = tmp_path / "e2e.json"
    cfg.write_text(json.dumps(_config()))
    _run("sr.py", tmp_path, "-p", "train", "-c", str(cfg))

    (exp_root,) = glob.glob(str(tmp_path / "experiments" / "e2e_*"))
    train_log = open(os.path.join(exp_root, "logs", "train.log")).read()
    assert "l_pix" in train_log  # per-step loss lines (print_freq=1)
    assert "# Validation # PSNR" in train_log  # in-train validation fired
    # threshold-crossing cadence: checkpoints at steps 2 and 4
    gen_ckpts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(exp_root, "checkpoint", "I*_gen"))
    )
    assert len(gen_ckpts) == 2, gen_ckpts
    assert any(c.startswith("I4_") for c in gen_ckpts)
    # in-train validation saved image panels under results/<epoch>/
    assert glob.glob(os.path.join(exp_root, "results", "*", "*_sr.png"))

    resume = os.path.join(
        exp_root, "checkpoint",
        [c for c in gen_ckpts if c.startswith("I4_")][0][: -len("_gen")],
    )

    # --- 2. sr.py val: full evaluation resuming the checkpoint ----------
    cfg_val = tmp_path / "e2e_val.json"
    cfg_val.write_text(json.dumps(_config(resume_state=resume)))
    _run("sr.py", tmp_path, "-p", "val", "-c", str(cfg_val))

    val_exp = sorted(glob.glob(str(tmp_path / "experiments" / "e2e_*")))
    val_root = [p for p in val_exp if p != exp_root][0]
    val_log = open(os.path.join(val_root, "logs", "val.log")).read()
    m = re.search(r"psnr:\s*([0-9.e+-]+),\s*ssim:\s*([0-9.e+-]+)", val_log)
    assert m, val_log[-2000:]
    assert float(m.group(1)) > 0
    results = os.path.join(val_root, "results")
    for tag in ("sr", "hr", "lr", "inf", "sr_process"):
        assert glob.glob(os.path.join(results, f"*_{tag}.png")), tag

    # --- 3. eval.py: offline re-scoring of the val results dir ----------
    proc = _run("eval.py", tmp_path, "-p", results)
    m = re.search(r"# Validation # PSNR: ([0-9.e+-]+)", proc.stdout)
    assert m and float(m.group(1)) > 0, proc.stdout

    # --- 4. infer.py: inference-only over the val set --------------------
    _run("infer.py", tmp_path, "-c", str(cfg_val))
    inf_exp = sorted(glob.glob(str(tmp_path / "experiments" / "e2e_*")))
    inf_root = [p for p in inf_exp if p not in (exp_root, val_root)][0]
    for tag in ("sr", "hr", "inf", "sr_process"):
        assert glob.glob(os.path.join(inf_root, "results", f"0_*_{tag}.png")), tag


def test_sample_driver(tmp_path):
    """sample.py train: unconditional generation smoke (tiny, T=10)."""
    opt = _config()
    opt["name"] = "e2e_uncond"
    opt["model"]["diffusion"]["conditional"] = False
    opt["model"]["unet"]["in_channel"] = 3
    opt["datasets"]["val"]["data_len"] = 1  # sample_sum
    cfg = tmp_path / "uncond.json"
    cfg.write_text(json.dumps(opt))
    _run("sample.py", tmp_path, "-p", "train", "-c", str(cfg))

    (exp_root,) = glob.glob(str(tmp_path / "experiments" / "e2e_uncond_*"))
    train_log = open(os.path.join(exp_root, "logs", "train.log")).read()
    assert "l_pix" in train_log
    assert glob.glob(os.path.join(exp_root, "results", "*", "*_sample.png"))
