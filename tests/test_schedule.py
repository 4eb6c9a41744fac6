"""Schedule math: all seven beta schedules + derived coefficient identities
(reference model/sr3_modules/diffusion.py:19-49,92-139)."""

import numpy as np
import pytest

from sr3_tpu.models.schedule import make_beta_schedule, make_schedule

pytestmark = pytest.mark.quick

ALL_SCHEDULES = ["quad", "linear", "warmup10", "warmup50", "const", "jsd",
                 "cosine"]


@pytest.mark.parametrize("name", ALL_SCHEDULES)
def test_beta_schedule_shapes_and_range(name):
    T = 100
    betas = make_beta_schedule(name, T, linear_start=1e-4, linear_end=2e-2)
    assert betas.shape == (T,)
    assert betas.dtype == np.float64
    assert np.all(betas > 0) and np.all(betas <= 1.0)


def test_linear_schedule_values():
    betas = make_beta_schedule("linear", 5, 0.1, 0.5)
    np.testing.assert_allclose(betas, np.linspace(0.1, 0.5, 5))


def test_quad_schedule_values():
    betas = make_beta_schedule("quad", 3, 0.01, 0.04)
    expected = np.linspace(0.1, 0.2, 3) ** 2
    np.testing.assert_allclose(betas, expected)


def test_jsd_schedule_values():
    betas = make_beta_schedule("jsd", 4)
    np.testing.assert_allclose(betas, [1 / 4, 1 / 3, 1 / 2, 1.0])


def test_warmup_schedule():
    betas = make_beta_schedule("warmup10", 100, 1e-4, 2e-2)
    assert np.all(betas[10:] == 2e-2)
    np.testing.assert_allclose(betas[:10], np.linspace(1e-4, 2e-2, 10))


def test_cosine_clip():
    betas = make_beta_schedule("cosine", 10)
    assert betas.max() <= 0.999


def test_schedule_coefficient_identities():
    sched = make_schedule({"schedule": "linear", "n_timestep": 50,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    # expectations must be derived in float64 from the f64 betas — the stored
    # f32 alphas_cumprod loses the 1e-6-scale precision that (1 - acp)
    # cancellation needs near t=0
    betas = make_beta_schedule("linear", 50, 1e-6, 1e-2)
    acp = np.cumprod(1.0 - betas)

    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-5)
    # prev shifted by one with leading 1
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev),
        np.append(1.0, acp[:-1]), rtol=1e-5,
    )
    # sqrt_alphas_cumprod_prev has length T+1 (reference :105-106)
    assert sched.sqrt_alphas_cumprod_prev.shape == (51,)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod_prev) ** 2,
        np.append(1.0, acp), rtol=1e-4,
    )
    # posterior variance = beta_t (1 - gamma_{t-1}) / (1 - gamma_t)
    prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance),
        betas * (1 - prev) / (1 - acp), rtol=1e-4, atol=1e-7,
    )
    # identities: recip^2 * acp == 1; recipm1^2 == 1/acp - 1
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recip_alphas_cumprod) ** 2 * acp,
        np.ones_like(acp), rtol=1e-4,
    )
    # posterior mean coefs sum: c1 + c2*sqrt(acp_t/acp_{t-1} something) — check
    # the DDPM identity c1*sqrt(prev) term via direct formula instead
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(prev) / (1 - acp), rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1 - prev) * np.sqrt(1 - betas) / (1 - acp), rtol=1e-4, atol=1e-7,
    )
    assert sched.num_timesteps == 50


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        make_beta_schedule("nope", 10)
