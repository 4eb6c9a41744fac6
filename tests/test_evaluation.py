"""Batched mesh-wide validation: grouping invariance and the shared
evaluator loops (VERDICT round-1 item 3)."""

import os

import jax
import numpy as np
import pytest

from sr3_tpu.parallel.mesh import create_mesh
from sr3_tpu.training.evaluation import GroupedEvaluator, per_image
from sr3_tpu.training.trainer import Trainer
from tests.test_trainer import _batch, _opt


@pytest.fixture()
def trainer(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")
    return t


def _images(n, hw=16):
    rng = np.random.default_rng(3)
    return rng.standard_normal((n, hw, hw, 3)).astype(np.float32) * 0.5


def _keys(base, n):
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(np.arange(n))


@pytest.fixture()
def uncond_trainer(tmp_path):
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    opt = _opt(tmp_path)
    opt["model"]["diffusion"]["conditional"] = False
    opt["model"]["unet"]["in_channel"] = 3
    t = Trainer(opt, mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")
    return t


def test_batched_sampling_grouping_invariant(trainer):
    """Image j's result depends only on keys[j]: one group of 4 == two
    groups of 2 == four singles. This is what makes batch-G validation a
    pure speedup with unchanged outputs."""
    xs = _images(4)
    keys = np.asarray(_keys(jax.random.PRNGKey(7), 4))

    whole = trainer.test_batched(xs, keys, continous=False)
    halves = np.concatenate([
        trainer.test_batched(xs[:2], keys[:2], continous=False),
        trainer.test_batched(xs[2:], keys[2:], continous=False),
    ])
    singles = np.concatenate([
        trainer.test_batched(xs[j:j + 1], keys[j:j + 1], continous=False)
        for j in range(4)
    ])
    np.testing.assert_allclose(whole, halves, atol=1e-6)
    np.testing.assert_allclose(whole, singles, atol=1e-6)


def test_batched_continuous_frames_shape(trainer):
    xs = _images(2)
    keys = np.asarray(_keys(jax.random.PRNGKey(7), 2))
    frames = trainer.test_batched(xs, keys, continous=True)
    # T=5 val schedule: snapshots = T frames (inter=1) + the input condition
    assert frames.shape == (2, 6, 16, 16, 3)
    np.testing.assert_allclose(frames[:, 0], xs, atol=1e-6)
    assert np.isfinite(frames).all()


def test_uncond_batched(uncond_trainer):
    keys = np.asarray(_keys(jax.random.PRNGKey(9), 3))
    out = uncond_trainer.sample_batched(keys, continous=False)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(out).all()


def test_grouped_evaluator_padding_matches_exact(tmp_path):
    """5 images through group=4 (one padded group) must equal group=1
    (no padding) and group=5, given the same base key."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")
    xs = _images(5)
    items = [{"SR": xs[j], "Index": j} for j in range(5)]
    base = jax.random.PRNGKey(11)

    def run(g):
        ev = GroupedEvaluator(t, group_size=g, base_rng=base)
        return np.stack([out for _, out in ev.run_sr(iter(items))])

    r4, r1, r5 = run(4), run(1), run(5)
    assert r4.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(r4, r1, atol=1e-6)
    np.testing.assert_allclose(r4, r5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_grouped_evaluator_on_mesh_matches_single_device(tmp_path):
    """Mesh-sharded group-of-8 evaluation equals single-device evaluation:
    the val set rides all chips with unchanged per-image outputs."""
    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t1 = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=1))
    t8 = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=8))
    for t in (t1, t8):
        t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")
    xs = _images(3)  # 3 images -> padded to 8 on the mesh
    items = [{"SR": xs[j], "Index": j} for j in range(3)]
    base = jax.random.PRNGKey(13)

    ev1 = GroupedEvaluator(t1, group_size=1, base_rng=base)
    ev8 = GroupedEvaluator(t8, base_rng=base)
    assert ev8.group == 8
    r1 = np.stack([o for _, o in ev1.run_sr(iter(items))])
    r8 = np.stack([o for _, o in ev8.run_sr(iter(items))])
    np.testing.assert_allclose(r1, r8, atol=1e-5)


def test_empty_val_set_does_not_crash(trainer, tmp_path):
    """An empty/misconfigured val dir must not kill a training run with
    ZeroDivisionError mid-flight (VERDICT r2 weak #5): validate_in_train
    returns NaN, restores the train schedule, and training continues."""
    import math

    from sr3_tpu.training.evaluation import validate_in_train

    class EmptyLoader:
        dataset = []

        def __iter__(self):
            return iter([])

    opt = trainer.opt
    opt["path"]["results"] = str(tmp_path / "results")
    opt["datasets"] = {"val": {"dataroot": "nowhere"}}
    psnr = validate_in_train(trainer, EmptyLoader(), opt, 1, 1)
    assert math.isnan(psnr)
    assert trainer.schedule_phase == "train"  # schedule restored


def test_group_size_default_drops_at_high_res():
    """>=256 output resolution defaults the val group to the mesh data
    axis (batch-8 512^2 chains would 8x the activation memory the configs
    were sized for; ADVICE r2 #1)."""
    from sr3_tpu.training.evaluation import _group_size

    assert _group_size({"datasets": {"val": {}}}, 10) == 8
    assert _group_size(
        {"datasets": {"val": {"r_resolution": 512}}}, 10) is None
    assert _group_size(
        {"datasets": {"val": {"r_resolution": 512, "batch_size": 2}}}, 10
    ) == 2
    assert _group_size(
        {"datasets": {"val": {"r_resolution": 128}}}, 3) == 3


def test_per_image_flattens_batches():
    batches = [
        {"HR": np.zeros((2, 4, 4, 3)), "Index": np.array([0, 1])},
        {"HR": np.ones((1, 4, 4, 3)), "Index": np.array([2])},
    ]
    items = list(per_image(iter(batches)))
    assert len(items) == 3
    assert items[0]["HR"].shape == (4, 4, 3)
    assert int(items[2]["Index"]) == 2
    assert items[2]["HR"].max() == 1.0


def test_run_uncond_count(uncond_trainer):
    ev = GroupedEvaluator(uncond_trainer, group_size=4,
                          base_rng=jax.random.PRNGKey(1))
    outs = list(ev.run_uncond(6, continous=False))
    assert len(outs) == 6
    assert outs[0].shape == (16, 16, 3)
