"""Spatial (H-axis) activation sharding: GSPMD layout only, numerics
unchanged. Equivalence vs the unsharded chain + layout assertions on a
virtual ('data' x 'model' x 'space') CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3_tpu.models.networks import define_G, init_params
from sr3_tpu.models.schedule import make_schedule
from sr3_tpu.parallel.mesh import create_mesh
from sr3_tpu.parallel.spatial import spatial_constraint
from sr3_tpu.training.trainer import Trainer
from sr3_tpu.utils.config import dict_to_nonedict

SCHED_OPT = {"schedule": "linear", "n_timestep": 8,
             "linear_start": 1e-6, "linear_end": 1e-2}


def _opt(space=1, image_size=16):
    return dict_to_nonedict({
        "phase": "train",
        "seed": 0,
        "path": {"checkpoint": "/tmp/spatial_ckpt", "resume_state": None},
        "datasets": {},
        "parallel": {"data": 2, "model": 1, "space": space},
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "dtype": "float32",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": 8,
                "norm_groups": 4, "channel_multiplier": [1, 2],
                "attn_res": [8], "res_blocks": 1, "dropout": 0.0,
            },
            "beta_schedule": {"train": SCHED_OPT, "val": SCHED_OPT},
            "diffusion": {"image_size": image_size, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 2, "optimizer": {"type": "adam", "lr": 1e-3}},
    })


def _model(image_size=16):
    opt = _opt(image_size=image_size)
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    sched = make_schedule(SCHED_OPT)
    return diffusion, params, sched


def test_spatial_sampling_equivalence_and_layout():
    """Same chain, same rng: H-sharded == unsharded, and the compiled
    output actually stays sharded over 'space' (the memory claim)."""
    diffusion, params, sched = _model()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32
    ) * 0.3
    rng = jax.random.PRNGKey(7)

    fn = jax.jit(lambda p, s, xi, k: diffusion.super_resolution(p, s, xi, k))
    ref = np.asarray(fn(params, sched, x, rng))

    mesh = create_mesh(num_data=2, num_model=1, num_space=4)
    assert mesh.shape["space"] == 4
    diffusion.shard_activations = spatial_constraint(mesh)
    try:
        fn2 = jax.jit(
            lambda p, s, xi, k: diffusion.super_resolution(p, s, xi, k))
        out = fn2(params, sched, x, rng)
        shard_shapes = {s.data.shape for s in out.addressable_shards}
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
        # per-device shard holds H/4 rows (and batch/2): layout is real
        assert shard_shapes == {(1, 4, 16, 3)}, shard_shapes
    finally:
        diffusion.shard_activations = None


def test_spatial_loss_and_grads_equivalence():
    diffusion, params, sched = _model()
    rng = jax.random.PRNGKey(3)
    batch = {
        "HR": jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 16, 16, 3)),
            jnp.float32) * 0.3,
        "SR": jnp.zeros((2, 16, 16, 3), jnp.float32),
    }

    def lossf(p):
        return diffusion.p_losses(p, sched, batch, rng, train=False)

    l_ref, g_ref = jax.jit(jax.value_and_grad(lossf))(params)

    mesh = create_mesh(num_data=2, num_model=1, num_space=4)
    diffusion.shard_activations = spatial_constraint(mesh)
    try:
        l_sp, g_sp = jax.jit(jax.value_and_grad(lossf))(params)
        np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            g_sp, g_ref,
        )
    finally:
        diffusion.shard_activations = None


def test_spatial_trainer_config_wiring():
    """"parallel": {"space": N} builds the 3-D mesh, installs the
    constraint, and trains to the same loss as the unsharded trainer."""
    rng = np.random.default_rng(0)
    batch = {
        "HR": rng.standard_normal((4, 16, 16, 3)).astype(np.float32) * 0.3,
        "SR": rng.standard_normal((4, 16, 16, 3)).astype(np.float32) * 0.3,
    }

    t_ref = Trainer(_opt(space=1), mesh=create_mesh(num_data=1))
    t_ref.set_new_noise_schedule(SCHED_OPT, "train")
    t_ref.feed_data(batch)
    t_ref.optimize_parameters()
    loss_ref = t_ref.get_current_log()["l_pix"]

    t_sp = Trainer(_opt(space=2))
    assert t_sp.mesh.shape["space"] == 2
    assert t_sp.diffusion.shard_activations is not None
    t_sp.set_new_noise_schedule(SCHED_OPT, "train")
    t_sp.feed_data(batch)
    t_sp.optimize_parameters()
    loss_sp = t_sp.get_current_log()["l_pix"]
    np.testing.assert_allclose(loss_sp, loss_ref, rtol=1e-5)
