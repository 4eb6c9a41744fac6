"""Diffusion process semantics: q_sample statistics, loss reduction,
sampler snapshot frames, RNG determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3_tpu.models.diffusion import (
    GaussianDiffusion,
    _snapshot_count,
    q_sample_gamma,
    q_sample_t,
)
from sr3_tpu.models.schedule import make_schedule
from sr3_tpu.models.unet import UNet


def _tiny(cond_mode="sr3", conditional=True):
    unet = UNet(
        in_channel=6 if conditional else 3, out_channel=3, inner_channel=8,
        norm_groups=4, channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
        dropout=0.0, image_size=16, cond_mode=cond_mode, init_type="default",
    )
    diff = GaussianDiffusion(unet, image_size=16, conditional=conditional,
                             cond_mode=cond_mode)
    x = jnp.zeros((1, 16, 16, unet.in_channel))
    params = unet.init({"params": jax.random.PRNGKey(0)}, x, jnp.ones((1,)),
                       train=False)
    return diff, params


def test_q_sample_gamma_statistics():
    # x_t = g*x0 + sqrt(1-g^2)*eps must preserve unit variance for unit inputs
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    g = jnp.full((4, 1), 0.6)
    xt = q_sample_gamma(x0, g, noise)
    expected = 0.6 * x0 + np.sqrt(1 - 0.36) * noise
    np.testing.assert_allclose(np.asarray(xt), np.asarray(expected), rtol=1e-5)


def test_q_sample_t_uses_schedule():
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-2, "linear_end": 1e-1})
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.ones_like(x0)
    t = jnp.asarray([0, 9])
    xt = np.asarray(q_sample_t(sched, x0, t, noise))
    sa = np.asarray(sched.sqrt_alphas_cumprod)
    s1 = np.asarray(sched.sqrt_one_minus_alphas_cumprod)
    np.testing.assert_allclose(xt[0], sa[0] + s1[0], rtol=1e-5)
    np.testing.assert_allclose(xt[1], sa[9] + s1[9], rtol=1e-5)


def test_snapshot_count_matches_reference_rule():
    # sample_inter = 1 | (T//10) (bitwise OR, reference diffusion.py:179)
    assert _snapshot_count(2000) == (10, 201)
    assert _snapshot_count(10) == (10, 1)
    assert _snapshot_count(1) == (1, 1)


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_loss_is_normalized_sum(cond_mode):
    diff, params = _tiny(cond_mode)
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    batch = {
        "HR": jnp.zeros((2, 16, 16, 3)),
        "SR": jnp.zeros((2, 16, 16, 3)),
    }
    loss = diff.p_losses(params, sched, batch, jax.random.PRNGKey(0),
                         train=False)
    assert np.isfinite(float(loss))
    # with an untrained net predicting ~0 and x0=0, the L1 to eps~N(0,1)
    # normalized per-element should be near E|N(0,1)| = 0.798
    assert 0.4 < float(loss) < 1.4


def test_sampler_continuous_frame_layout():
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((2, 16, 16, 3))
    out = diff.super_resolution(params, sched, x, jax.random.PRNGKey(0),
                                continuous=True)
    # 1 input frame + 10 snapshots, each of batch 2
    assert out.shape == (22, 16, 16, 3)
    # frame 0 is the condition input
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(x))
    # final frames equal the non-continuous result with the same key
    final = diff.super_resolution(params, sched, x, jax.random.PRNGKey(0),
                                  continuous=False)
    np.testing.assert_allclose(np.asarray(out[-2:]), np.asarray(final),
                               atol=1e-6)


def test_sampler_deterministic_per_key():
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((1, 16, 16, 3))
    a = diff.super_resolution(params, sched, x, jax.random.PRNGKey(7))
    b = diff.super_resolution(params, sched, x, jax.random.PRNGKey(7))
    c = diff.super_resolution(params, sched, x, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


def test_unconditional_sample_shape():
    diff, params = _tiny(conditional=False)
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    out = diff.sample(params, sched, jax.random.PRNGKey(0), batch_size=3)
    assert out.shape == (3, 16, 16, 3)


def test_ddpm_interpolate():
    diff, params = _tiny(cond_mode="ddpm", conditional=False)
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x1 = jnp.zeros((1, 16, 16, 3))
    x2 = jnp.ones((1, 16, 16, 3))
    out = diff.interpolate(params, sched, x1, x2, jax.random.PRNGKey(0))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_shapes_and_determinism():
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 20,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((2, 16, 16, 3))
    out = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                n_steps=5, eta=0.0)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # eta=0: deterministic given the initial noise (key_init); the chain key
    # draws are multiplied by sigma=0
    a = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(7),
                              n_steps=5, eta=0.0)
    b = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(7),
                              n_steps=5, eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddim_continuous_frames():
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 20,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((1, 16, 16, 3))
    out = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                n_steps=10, eta=0.5, continuous=True)
    # 1 condition frame + 10 snapshots (inter=1 for S=10)
    assert out.shape == (11, 16, 16, 3)
    final = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                  n_steps=10, eta=0.5)
    np.testing.assert_allclose(np.asarray(out[-1:]), np.asarray(final),
                               atol=1e-6)


def test_ddim_full_sequence_eta1_equals_ancestral():
    """With S=T and eta=1 DDIM is EXACTLY the ancestral DDPM chain (same
    posterior mean/variance, same key schedule) — including through the
    x0-clip, since eps is re-derived from the clipped x0."""
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-4, "linear_end": 1e-1})
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3)) * 0.3
    for clip in (False, True):
        anc = diff.p_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                 clip_denoised=clip)
        ddim = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                     n_steps=10, eta=1.0, clip_denoised=clip)
        np.testing.assert_allclose(np.asarray(anc), np.asarray(ddim),
                                   atol=1e-4)


def test_dpmpp_shapes_and_determinism():
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 20,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((2, 16, 16, 3))
    out = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                 n_steps=5)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # fully deterministic ODE solver: only the initial noise draw uses rng
    a = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(7),
                               n_steps=5)
    b = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(7),
                               n_steps=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # single-step edge: one forward, output = clipped x0 prediction
    one = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                 n_steps=1)
    assert one.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(one)).all()


def test_dpmpp_continuous_frames():
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 20,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((1, 16, 16, 3))
    out = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                 n_steps=10, continuous=True)
    # 1 condition frame + 10 snapshots (inter=1 for S=10)
    assert out.shape == (11, 16, 16, 3)
    final = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                   n_steps=10)
    np.testing.assert_allclose(np.asarray(out[-1:]), np.asarray(final),
                               atol=1e-6)


def test_dpmpp_second_order_beats_ddim_at_equal_steps():
    """Both DDIM (eta=0) and DPM-Solver++ discretize the same probability-
    flow ODE defined by the eps-model, so with a fine-step DDIM solution as
    reference, the order-2 solver must land closer than order-1 DDIM at the
    same (small) step count. clip off so the trajectory is the smooth ODE.

    Measured on this untrained tiny model (T=256): dpmpp/ddim mean-|err|
    S=16: 0.0074/0.0168, S=32: 0.0021/0.0076, S=64: 0.0013/0.0032 —
    error ratio ~6x per step-doubling (order 2) vs DDIM's ~2.2x (order 1).
    Below S~8 the 2M extrapolation can lose on a rough random-weight x0
    trajectory, so the assertion sits in the asymptotic regime."""
    diff, params = _tiny()
    T = 256
    sched = make_schedule({"schedule": "linear", "n_timestep": T,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 0.3
    ref = diff.ddim_sample_loop(params, sched, x, jax.random.PRNGKey(0),
                                n_steps=T, eta=0.0, clip_denoised=False)
    S = 16
    coarse_ddim = diff.ddim_sample_loop(
        params, sched, x, jax.random.PRNGKey(0), n_steps=S, eta=0.0,
        clip_denoised=False)
    coarse_dpmpp = diff.dpmpp_sample_loop(
        params, sched, x, jax.random.PRNGKey(0), n_steps=S,
        clip_denoised=False)
    err_ddim = float(np.abs(np.asarray(coarse_ddim - ref)).mean())
    err_dpmpp = float(np.abs(np.asarray(coarse_dpmpp - ref)).mean())
    assert np.isfinite(err_dpmpp) and np.isfinite(err_ddim)
    # order-2 should win by a clear margin here, not a hair
    assert err_dpmpp < 0.7 * err_ddim, (err_dpmpp, err_ddim)


def test_dpmpp_sde_variant():
    """eta>0 = SDE-DPM-Solver++(2M): stochastic (distinct draws under
    different chain keys), valid images, and still one forward per step."""
    diff, params = _tiny()
    sched = make_schedule({"schedule": "linear", "n_timestep": 20,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    x = jnp.zeros((2, 16, 16, 3))
    a = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(1),
                               n_steps=6, eta=1.0)
    assert a.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(a)).all()
    b = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(1),
                               n_steps=6, eta=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = diff.dpmpp_sample_loop(params, sched, x, jax.random.PRNGKey(2),
                               n_steps=6, eta=1.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))
