"""Noise-schedule math for Gaussian diffusion.

Functional re-design of the reference's buffer registration
(model/sr3_modules/diffusion.py:19-49 and :92-139): all coefficients are
precomputed on the host in float64 (matching the reference's numpy-f64 →
torch-f32 pipeline) and carried as a single immutable pytree that flows
through jitted functions, instead of mutable nn.Module buffers.

Posterior convention (reference README.md:14):
  var(x_{t-1} | x_t, x_0) = beta_t * (1 - gamma_{t-1}) / (1 - gamma_t).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def _warmup_beta(linear_start, linear_end, n_timestep, warmup_frac):
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64
    )
    return betas


def make_beta_schedule(
    schedule, n_timestep, linear_start=1e-4, linear_end=2e-2, cosine_s=8e-3
):
    """All seven beta schedules of the reference
    (model/sr3_modules/diffusion.py:19-49), in float64 numpy."""
    if schedule == "quad":
        betas = (
            np.linspace(
                linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (
            np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        )
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=None, a_max=0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


@struct.dataclass
class Schedule:
    """Immutable pytree of diffusion coefficients.

    All arrays are float32 on device, length T except
    ``sqrt_alphas_cumprod_prev`` which has length T+1 (index 0 is gamma=1,
    matching reference model/sr3_modules/diffusion.py:105-106).
    ``num_timesteps`` is static metadata so it can drive lax.scan lengths.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    sqrt_alphas_cumprod_prev: jnp.ndarray  # length T+1
    num_timesteps: int = struct.field(pytree_node=False)


def make_schedule(schedule_opt) -> Schedule:
    """Build a Schedule from a config dict with keys
    schedule / n_timestep / linear_start / linear_end
    (reference model/sr3_modules/diffusion.py:92-139)."""
    betas = make_beta_schedule(
        schedule=schedule_opt["schedule"],
        n_timestep=int(schedule_opt["n_timestep"]),
        linear_start=schedule_opt.get("linear_start", 1e-4),
        linear_end=schedule_opt.get("linear_end", 2e-2),
        cosine_s=schedule_opt.get("cosine_s", 8e-3),
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    sqrt_alphas_cumprod_prev = np.sqrt(np.append(1.0, alphas_cumprod))

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        sqrt_alphas_cumprod_prev=f32(sqrt_alphas_cumprod_prev),
        num_timesteps=int(betas.shape[0]),
    )
