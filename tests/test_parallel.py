"""Mesh/batch-placement regressions: indivisible batches on a multi-device
mesh (the reference workflow runs batch-1 validation mid-training) and the
multi-host assembly path."""

import os

import jax
import numpy as np
import pytest

from sr3_tpu.parallel.mesh import batch_sharding, create_mesh, shard_batch
from tests.test_trainer import _batch, _opt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_shard_batch_divisible_is_sharded():
    mesh = create_mesh(num_data=8)
    out = shard_batch({"HR": np.zeros((8, 4, 4, 3), np.float32)}, mesh)
    assert out["HR"].sharding == batch_sharding(mesh)
    assert not out["HR"].sharding.is_fully_replicated


@pytest.mark.parametrize("b", [1, 3])
def test_shard_batch_indivisible_replicates(b):
    """batch 1/3 on an 8-way data mesh must not crash (it did): falls back
    to full replication, which is numerically identical."""
    mesh = create_mesh(num_data=8)
    x = np.random.default_rng(0).standard_normal((b, 4, 4, 3)).astype(
        np.float32
    )
    out = shard_batch({"HR": x}, mesh)
    assert out["HR"].sharding.is_fully_replicated
    np.testing.assert_array_equal(jax.device_get(out["HR"]), x)


def test_val_and_inference_on_multichip_mesh(tmp_path):
    """The reference's one-flag data-parallel capability includes running
    batch-1 validation mid-training (reference sr.py:103-161); on a >1-device
    data mesh this used to crash in shard_batch."""
    from sr3_tpu.training.trainer import Trainer

    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=8))
    t.set_new_noise_schedule(t.opt["model"]["beta_schedule"]["val"], "val")

    t.feed_data(_batch(1))
    t.test(continous=False)
    vis = t.get_current_visuals()
    assert vis["SR"].shape == (1, 16, 16, 3)
    assert np.isfinite(vis["SR"]).all()

    # continuous-mode process frames, batch 3 (also indivisible by 8)
    t.feed_data(_batch(3))
    t.test(continous=True)
    assert np.isfinite(t.output).all()


def test_full_cycle_train_val_ckpt_multichip(tmp_path):
    """train (batch 8, sharded) -> batch-1 val -> checkpoint -> resume ->
    train again, all on the 8-device mesh: the workflow sr.py drives."""
    from sr3_tpu.training.trainer import Trainer

    os.makedirs(tmp_path / "ckpt", exist_ok=True)
    opt = _opt(tmp_path)
    t = Trainer(opt, mesh=create_mesh(num_data=8))
    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")
    for _ in range(2):
        t.feed_data(_batch(8))
        t.optimize_parameters()

    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    t.feed_data(_batch(1))
    t.test(continous=False)
    assert np.isfinite(t.output).all()

    t.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")
    t.save_network(epoch=1, iter_step=2)
    t.wait_for_checkpoints()

    opt2 = _opt(tmp_path)
    opt2["path"]["resume_state"] = str(tmp_path / "ckpt" / "I2_E1")
    t2 = Trainer(opt2, mesh=create_mesh(num_data=8))
    assert t2.begin_step == 2
    t2.set_new_noise_schedule(opt2["model"]["beta_schedule"]["train"], "train")
    t2.feed_data(_batch(8))
    t2.optimize_parameters()
    assert np.isfinite(t2.get_current_log()["l_pix"])


def test_multihost_loader_shards_disjoint(monkeypatch, tmp_path):
    """Under multi-process JAX each process must read a disjoint,
    deterministic shard of the (identically shuffled) epoch order so the
    assembled global batch covers the dataset exactly once
    (loader.py _batches; assembly in mesh.shard_batch)."""
    from sr3_tpu.data.loader import DataLoader

    class Toy:
        min_max = (-1, 1)

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"HR": np.full((2, 2, 3), i, np.float32), "Index": i}

    def epoch_indices(pc, pi, seed=0):
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        loader = DataLoader(Toy(), batch_size=2, shuffle=True, seed=seed,
                            use_native=False)
        return [int(i) for b in loader for i in b["Index"]]

    shard0 = epoch_indices(2, 0)
    shard1 = epoch_indices(2, 1)
    # disjoint, covering, and deterministic given the shared seed
    assert set(shard0).isdisjoint(shard1)
    assert sorted(shard0 + shard1) == list(range(16))
    assert shard0 == epoch_indices(2, 0)
    # per-process batch 2 -> global batch 4 divides the 8-way data axis? no:
    # 4 % 8 != 0 raises; batch 4 -> global 8 assembles into a sharded array
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    mesh = create_mesh(num_data=8)
    with pytest.raises(ValueError, match="multi-host"):
        shard_batch({"HR": np.zeros((2, 4, 4, 3), np.float32)}, mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_device_resident_training_multichip(tmp_path):
    """Device-resident training on an 8-device data mesh must match the
    single-device trajectory (the on-device batch is sharded over 'data'
    via a sharding constraint — without it every chip would redundantly
    train on the full batch)."""
    import numpy as np
    from sr3_tpu.training.trainer import Trainer
    from tests.test_trainer import _opt

    os.makedirs(tmp_path / "ckpt", exist_ok=True)

    class Tiny:
        min_max = (-1, 1)

        def __len__(self):
            return 8

        def _decoded(self, i):
            rng = np.random.default_rng(i)
            return {
                "HR": rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                "SR": rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
            }

    results = []
    for ndev in (1, 8):
        t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=ndev))
        t.set_new_noise_schedule(
            t.opt["model"]["beta_schedule"]["train"], "train")
        t.load_device_dataset(Tiny())
        for _ in range(2):
            t.optimize_parameters_resident(batch_size=8, k_steps=2)
        results.append(
            jax.tree_util.tree_leaves(jax.device_get(t.state.params)))
    for x, y in zip(*results):
        np.testing.assert_allclose(x, y, atol=2e-3)
