"""Trainer integration: train step, schedule switching, checkpoint
save/resume, and 8-device data-parallel equivalence."""

import os

import jax
import numpy as np
import pytest

from sr3_tpu.parallel.mesh import create_mesh
from sr3_tpu.training.trainer import Trainer
from sr3_tpu.utils.config import dict_to_nonedict


def _opt(tmp_path, batch_size=2, finetune_norm=False, use_ema=False):
    return dict_to_nonedict({
        "phase": "train",
        "seed": 0,
        "path": {
            "checkpoint": str(tmp_path / "ckpt"),
            "resume_state": None,
        },
        "datasets": {},
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": finetune_norm,
            "dtype": "float32",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": 8,
                "norm_groups": 4, "channel_multiplier": [1, 2],
                "attn_res": [8], "res_blocks": 1, "dropout": 0.0,
            },
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 5,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {
            "n_iter": 10,
            "optimizer": {"type": "adam", "lr": 1e-3},
            "ema_scheduler": {
                "step_start_ema": 1, "update_ema_every": 1,
                "ema_decay": 0.9, "use_ema": use_ema,
            },
        },
    })


def _batch(b=2):
    rng = np.random.default_rng(0)
    return {
        "HR": rng.standard_normal((b, 16, 16, 3)).astype(np.float32) * 0.5,
        "SR": rng.standard_normal((b, 16, 16, 3)).astype(np.float32) * 0.5,
        "Index": np.arange(b),
    }


def test_train_step_reduces_loss(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(
        t.opt["model"]["beta_schedule"]["train"], "train")
    losses = []
    for _ in range(8):
        t.feed_data(_batch())
        t.optimize_parameters()
        losses.append(t.get_current_log()["l_pix"])
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch every step -> must overfit


def test_schedule_switching(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["train"], "train")
    assert t.sched.num_timesteps == 10
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")
    assert t.sched.num_timesteps == 5
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["train"], "train")
    assert t.sched.num_timesteps == 10


def test_test_and_visuals(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")
    t.feed_data(_batch(1))
    t.test(continous=False)
    vis = t.get_current_visuals()
    assert vis["SR"].shape == (1, 16, 16, 3)
    assert vis["INF"].shape == (1, 16, 16, 3)
    assert np.isfinite(vis["SR"]).all()


def test_checkpoint_save_resume(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    opt = _opt(tmp_path)
    t = Trainer(opt, mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")
    for _ in range(3):
        t.feed_data(_batch())
        t.optimize_parameters()
    t.save_network(epoch=1, iter_step=3)
    t.wait_for_checkpoints()

    prefix = str(tmp_path / "ckpt" / "I3_E1")
    assert os.path.isdir(prefix + "_gen")
    assert os.path.isdir(prefix + "_opt")

    opt2 = _opt(tmp_path)
    opt2["path"]["resume_state"] = prefix
    t2 = Trainer(opt2, mesh=create_mesh(num_data=1))
    assert t2.begin_step == 3
    assert t2.begin_epoch == 1
    a = jax.tree_util.tree_leaves(jax.device_get(t.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(t2.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # the restored optimizer state must be directly usable: train one step
    # (regression: a bare orbax restore turned ScaleByAdamState into a dict
    # and the first optimize_parameters() after resume crashed)
    t2.set_new_noise_schedule(opt2["model"]["beta_schedule"]["train"], "train")
    t2.feed_data(_batch())
    t2.optimize_parameters()
    assert np.isfinite(t2.get_current_log()["l_pix"])

    # and the resumed trajectory must match continuing the original trainer
    t.feed_data(_batch())
    t.optimize_parameters()
    pa = jax.tree_util.tree_leaves(jax.device_get(t.state.params))
    pb = jax.tree_util.tree_leaves(jax.device_get(t2.state.params))
    for x, y in zip(pa, pb):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_ema_tracks_params(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path, use_ema=True), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["train"], "train")
    for _ in range(3):
        t.feed_data(_batch())
        t.optimize_parameters()
    p = jax.device_get(t.state.params)
    e = jax.device_get(t.state.ema_params)
    diffs = [
        np.abs(x - y).max()
        for x, y in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(e))
    ]
    assert max(diffs) > 0  # ema lags params once started


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_matches_single_device(tmp_path):
    """DP over 8 devices must produce the same loss/params trajectory as a
    single device (same global batch, same rng) — the capability the
    reference's DataParallel provided (SURVEY §2 row 20)."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)

    t1 = Trainer(_opt(tmp_path, batch_size=8), mesh=create_mesh(num_data=1))
    t8 = Trainer(_opt(tmp_path, batch_size=8), mesh=create_mesh(num_data=8))
    t1.set_new_noise_schedule(t1.opt["model"]["beta_schedule"]["train"], "train")
    t8.set_new_noise_schedule(t8.opt["model"]["beta_schedule"]["train"], "train")

    for i in range(3):
        batch = _batch(8)
        t1.feed_data(batch)
        t8.feed_data(batch)
        t1.optimize_parameters()
        t8.optimize_parameters()
        l1 = t1.get_current_log()["l_pix"]
        l8 = t8.get_current_log()["l_pix"]
        np.testing.assert_allclose(l1, l8, rtol=1e-4)

    a = jax.tree_util.tree_leaves(jax.device_get(t1.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(t8.state.params))
    for x, y in zip(a, b):
        # reduction order differs across shardings; adam amplifies the
        # float32 noise slightly over 3 steps
        np.testing.assert_allclose(x, y, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tensor_parallel_matches_single_device(tmp_path):
    """dp4 x tp2 (channel-sharded params via GSPMD) must match single-device
    training — tensor parallelism beyond the reference's envelope."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)

    t1 = Trainer(_opt(tmp_path, batch_size=8), mesh=create_mesh(num_data=1))
    ttp = Trainer(
        _opt(tmp_path, batch_size=8),
        mesh=create_mesh(num_data=4, num_model=2),
    )
    t1.set_new_noise_schedule(t1.opt["model"]["beta_schedule"]["train"], "train")
    ttp.set_new_noise_schedule(ttp.opt["model"]["beta_schedule"]["train"], "train")

    for _ in range(2):
        batch = _batch(8)
        t1.feed_data(batch)
        ttp.feed_data(batch)
        t1.optimize_parameters()
        ttp.optimize_parameters()
        np.testing.assert_allclose(
            t1.get_current_log()["l_pix"],
            ttp.get_current_log()["l_pix"],
            rtol=1e-4,
        )

    a = jax.tree_util.tree_leaves(jax.device_get(t1.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(ttp.state.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-3)


def test_multi_step_dispatch_matches_sequential(tmp_path):
    """K fused steps must equal K sequential steps exactly (same fold_in
    keys via the state.step counter)."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    ta = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    tb = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    ta.set_new_noise_schedule(ta.opt["model"]["beta_schedule"]["train"], "train")
    tb.set_new_noise_schedule(tb.opt["model"]["beta_schedule"]["train"], "train")

    batches = [_batch(), _batch(), _batch()]
    for b in batches:
        ta.feed_data(b)
        ta.optimize_parameters()
    la = ta.get_current_log()["l_pix"]

    tb.feed_data(batches[0])
    tb.optimize_parameters()  # establish identical rng base split order
    # rebuild tb to keep step counters aligned: use a fresh trainer instead
    tb2 = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    tb2.set_new_noise_schedule(tb2.opt["model"]["beta_schedule"]["train"], "train")
    tb2.optimize_parameters_multi(batches)
    lb = tb2.get_current_log()["l_pix"]
    np.testing.assert_allclose(la, lb, rtol=1e-5)
    pa = jax.tree_util.tree_leaves(jax.device_get(ta.state.params))
    pb = jax.tree_util.tree_leaves(jax.device_get(tb2.state.params))
    for x, y in zip(pa, pb):
        # scan-inlined steps reassociate float ops slightly
        np.testing.assert_allclose(x, y, atol=1e-4)


def test_device_resident_training(tmp_path):
    """Device-resident path: the whole train set uploaded once as uint8,
    batches sampled/normalized/flipped on-device in a fused K-step scan —
    loss must go down and the step counter advance by K per dispatch.
    Works on any mesh (dataset replicated)."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["train"], "train")

    class Tiny:
        min_max = (-1, 1)

        def __len__(self):
            return 4

        def _decoded(self, i):
            rng = np.random.default_rng(i)
            return {
                "HR": rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                "SR": rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
            }

    t.load_device_dataset(Tiny())
    dd = t._dev_data
    assert dd["HR"].dtype == np.uint8 and dd["HR"].shape == (4, 16, 16, 3)

    losses = []
    for _ in range(6):
        t.optimize_parameters_resident(batch_size=4, k_steps=3)
        losses.append(t.get_current_log()["l_pix"])
    assert int(t.state.step) == 18
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # 4 fixed images -> must overfit


def test_mu_dtype_bf16(tmp_path):
    """optimizer.mu_dtype="bfloat16" stores the Adam first moment in bf16
    (halving its HBM traffic) and still trains."""
    import jax.numpy as jnp

    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    opt = _opt(tmp_path)
    opt["train"]["optimizer"]["mu_dtype"] = "bfloat16"
    t = Trainer(opt, mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["train"], "train")
    t.feed_data(_batch())
    t.optimize_parameters()
    mu = t.state.opt_state[0].mu
    dtypes = {x.dtype for x in jax.tree_util.tree_leaves(mu)}
    assert dtypes == {jnp.dtype(jnp.bfloat16)}
    nu = t.state.opt_state[0].nu
    assert {x.dtype for x in jax.tree_util.tree_leaves(nu)} == {
        jnp.dtype(jnp.float32)
    }
    assert np.isfinite(float(t.log_dict["l_pix"]))


def test_eval_param_precast_bitwise_identical(tmp_path):
    """Pre-casting >=2D params to bf16 before the chain is bitwise
    identical to flax's internal per-op f32->bf16 casts."""
    import jax.numpy as jnp

    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    opt = _opt(tmp_path)
    opt["model"]["dtype"] = "bfloat16"
    t = Trainer(opt, mesh=create_mesh(num_data=1))
    params = t.state.params
    cast = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 6)),
        jnp.bfloat16)
    lvl = jnp.full((2,), 0.7, jnp.float32)
    y1 = t.diffusion.denoise_fn.apply(params, x, lvl, train=False)
    y2 = t.diffusion.denoise_fn.apply(cast, x, lvl, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_device_resident_batch_larger_than_dataset(tmp_path):
    """batch_size > n samples must sample with replacement, not silently
    deliver a short batch (regression: permutation[:batch] under-filled)."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["train"], "train")

    class Tiny:
        min_max = (-1, 1)

        def __len__(self):
            return 3

        def _decoded(self, i):
            rng = np.random.default_rng(i)
            return {
                "HR": rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                "SR": rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
            }

    t.load_device_dataset(Tiny())
    t.optimize_parameters_resident(batch_size=8, k_steps=2)
    assert int(t.state.step) == 2
    assert np.isfinite(float(t.get_current_log()["l_pix"]))


def test_sampler_config_routing(tmp_path):
    """model.diffusion.sampler selects the reverse chain: dpm++ and ddim
    produce valid images through the trainer's test() path and differ from
    the ancestral chain (different integrators), while per-sampler jit
    caches stay distinct."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    outs = {}
    for sampler in ("ddpm", "ddim", "dpm++"):
        opt = _opt(tmp_path)
        opt["model"]["diffusion"]["sampler"] = sampler
        opt["model"]["diffusion"]["sampler_steps"] = 4
        t = Trainer(opt, mesh=create_mesh(num_data=1))
        t.set_new_noise_schedule(
            t.opt["model"]["beta_schedule"]["val"], "val")
        t.feed_data(_batch())
        t.test(continous=False)
        sr = t.get_current_visuals()["SR"]
        assert sr.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(sr)).all()
        outs[sampler] = np.asarray(sr)
    assert not np.allclose(outs["ddpm"], outs["dpm++"])
    assert not np.allclose(outs["ddim"], outs["dpm++"])
