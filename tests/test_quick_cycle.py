"""Quick-tier integration smoke: real Trainer + real train_loop + mesh.

The quick tier (`pytest -m quick`) previously exercised no trainer step,
no loop cycle, and no mesh code — the integration layer only ran in the
unmarked ~10-minute files (test_drivers / test_trainer / test_parallel).
This file drives the full train -> in-train val (T=4 sampling chain) ->
checkpoint -> resume -> continue cycle in-process on a micro model
(8x8 images, inner_channel=8, T=4, 2+2 steps) over the session's
8-virtual-device CPU mesh, in well under a minute.

Mirrors the reference's debug smoke workflow (config/sr_sr3_16_128.json
debug shrink + sr.py train loop) at toy scale.
"""

import glob
import os

import numpy as np
import pytest

from sr3_tpu.parallel.mesh import create_mesh
from sr3_tpu.training.loops import train_loop
from sr3_tpu.training.trainer import Trainer
from sr3_tpu.utils.config import dict_to_nonedict

pytestmark = pytest.mark.quick


def _opt(tmp_path, n_iter, resume_state=None):
    sched = {"schedule": "linear", "n_timestep": 4,
             "linear_start": 1e-6, "linear_end": 1e-2}
    return dict_to_nonedict({
        "phase": "train",
        "seed": 0,
        "path": {"checkpoint": str(tmp_path / "ckpt"),
                 "resume_state": resume_state},
        "datasets": {},
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
            "diffusion": {"image_size": 8, "channels": 3,
                          "conditional": True},
        },
        "train": {
            "n_iter": n_iter,
            "val_freq": 2,
            "save_checkpoint_freq": 2,
            "print_freq": 1,
            "optimizer": {"type": "adam", "lr": 1e-3},
        },
        "log_wandb_ckpt": False,
    })


class _Loader:
    """Minimal train-loader protocol: __len__/__iter__/dataset/batch_size."""

    def __init__(self, batches):
        self.batches = batches
        self.dataset = list(range(len(batches) * 8))
        self.batch_size = 8

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class _CountingTrainer(Trainer):
    steps_run = 0

    def optimize_parameters(self):
        super().optimize_parameters()
        _CountingTrainer.steps_run += 1


def _batch(seed):
    rng = np.random.default_rng(seed)
    return {
        "HR": rng.standard_normal((8, 8, 8, 3)).astype(np.float32) * 0.5,
        "SR": rng.standard_normal((8, 8, 8, 3)).astype(np.float32) * 0.5,
        "Index": np.arange(8),
    }


def test_micro_train_val_ckpt_resume_cycle(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    mesh = create_mesh(num_data=8)  # all 8 virtual devices, data-parallel
    loader = _Loader([_batch(0), _batch(1)])

    # --- train 2 steps; val + checkpoint fire at step 2 ------------------
    opt = _opt(tmp_path, n_iter=2)
    _CountingTrainer.steps_run = 0
    t = Trainer.__new__(_CountingTrainer)
    t.__init__(opt, mesh=mesh)
    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")

    val_calls = []

    def on_validate(step, epoch):
        # in-train validation: run the T=4 sampling chain on one batch
        t.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
        t.feed_data(_batch(2))
        t.test(continous=False)
        vis = t.get_current_visuals()
        assert vis["SR"].shape == (8, 8, 8, 3)
        assert np.isfinite(vis["SR"]).all()
        t.set_new_noise_schedule(
            opt["model"]["beta_schedule"]["train"], "train")
        val_calls.append(step)

    train_loop(t, loader, opt, on_validate)
    assert _CountingTrainer.steps_run == 2
    assert val_calls == [2]
    assert np.isfinite(t.get_current_log()["l_pix"])

    ckpts = glob.glob(str(tmp_path / "ckpt" / "I2_E*_gen"))
    assert len(ckpts) == 1, ckpts
    prefix = ckpts[0][: -len("_gen")]

    # --- resume from the checkpoint and continue to n_iter=4 -------------
    opt2 = _opt(tmp_path, n_iter=4, resume_state=prefix)
    _CountingTrainer.steps_run = 0
    t2 = Trainer.__new__(_CountingTrainer)
    t2.__init__(opt2, mesh=mesh)
    assert t2.begin_step == 2
    t2.set_new_noise_schedule(opt2["model"]["beta_schedule"]["train"], "train")
    train_loop(t2, loader, opt2, lambda s, e: None)
    assert _CountingTrainer.steps_run == 2  # only the remaining 2 steps
    assert glob.glob(str(tmp_path / "ckpt" / "I4_E*_gen"))
    assert np.isfinite(t2.get_current_log()["l_pix"])
