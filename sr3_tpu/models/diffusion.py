"""Gaussian diffusion core: training losses + reverse-chain sampling.

Functional re-design of the reference's GaussianDiffusion
(model/sr3_modules/diffusion.py:64-249, model/ddpm_modules/diffusion.py).
Two conditioning modes share one implementation:

- ``cond_mode='sr3'``: continuous noise level. Training draws one scalar
  t ~ U{1..T} per step and per-sample sqrt-gamma ~ U[sqrt_acp[t-1],
  sqrt_acp[t]] (reference sr3_modules/diffusion.py:221-246); sampling
  conditions the net on the scalar sqrt_alphas_cumprod_prev[t+1]
  (:151-167).
- ``cond_mode='ddpm'``: discrete timesteps. Training draws t ~ U{0..T-1}
  per sample (reference ddpm_modules/diffusion.py:278-294); sampling
  conditions on the integer t.

TPU-first differences from the reference:
- the entire reverse chain is ONE compiled ``lax.scan`` — the reference runs
  a Python loop with a host round-trip per step
  (sr3_modules/diffusion.py:193, the #1 perf problem noted in SURVEY §3.2);
- RNG is on-device ``jax.random`` instead of host numpy
  (sr3_modules/diffusion.py:224-233);
- data layout is NHWC.

All functions are pure: (params, schedule, data, rng) -> result.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sr3_tpu.models.schedule import Schedule
from sr3_tpu.models.unet import UNet


def q_sample_gamma(x_start, sqrt_gamma, noise):
    """SR3 forward noising with continuous per-sample sqrt-gamma
    (reference sr3_modules/diffusion.py:212-219). sqrt_gamma: (b,1)."""
    g = sqrt_gamma.reshape(-1, 1, 1, 1)
    return g * x_start + jnp.sqrt(1.0 - g ** 2) * noise


def q_sample_t(sched: Schedule, x_start, t, noise):
    """DDPM forward noising at integer timesteps t: (b,)
    (reference ddpm_modules/diffusion.py:259-267)."""
    c1 = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    c2 = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    return c1 * x_start + c2 * noise


def q_mean_variance(sched: Schedule, x_start, t):
    """Moments of q(x_t | x_0) at integer t: (mean, variance, log_variance)
    (reference ddpm_modules/diffusion.py:151-156)."""
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    mean = sched.sqrt_alphas_cumprod[t].reshape(shape) * x_start
    variance = (1.0 - sched.alphas_cumprod[t]).reshape(shape)
    log_variance = sched.log_one_minus_alphas_cumprod[t].reshape(shape)
    return mean, variance, log_variance


def predict_start_from_noise(sched: Schedule, x_t, t, noise):
    """x_0 estimate from x_t and predicted eps (reference
    sr3_modules/diffusion.py:141-143). ``t`` may be scalar or (b,)."""
    if jnp.ndim(t) == 0:
        c1, c2 = sched.sqrt_recip_alphas_cumprod[t], \
            sched.sqrt_recipm1_alphas_cumprod[t]
    else:
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        c1 = sched.sqrt_recip_alphas_cumprod[t].reshape(shape)
        c2 = sched.sqrt_recipm1_alphas_cumprod[t].reshape(shape)
    return c1 * x_t - c2 * noise


def q_posterior(sched: Schedule, x_start, x_t, t):
    """Posterior q(x_{t-1} | x_t, x_0): (mean, log_variance_clipped)
    (reference sr3_modules/diffusion.py:145-149)."""
    mean = (
        sched.posterior_mean_coef1[t] * x_start
        + sched.posterior_mean_coef2[t] * x_t
    )
    return mean, sched.posterior_log_variance_clipped[t]


def _snapshot_count(num_timesteps: int) -> tuple:
    """Frames collected by the reference's `i % sample_inter == 0` rule with
    sample_inter = 1 | (T // 10) — bitwise OR, faithfully reproduced
    (sr3_modules/diffusion.py:179)."""
    inter = 1 | (num_timesteps // 10)
    return (num_timesteps - 1) // inter + 1, inter


class GaussianDiffusion:
    """Stateless orchestrator binding a UNet to the diffusion math.

    Unlike the reference (an nn.Module holding mutable buffers), this class
    holds only static configuration; params and Schedule flow through calls.
    """

    def __init__(
        self,
        denoise_fn: UNet,
        image_size: int,
        channels: int = 3,
        loss_type: str = "l1",
        conditional: bool = True,
        cond_mode: str = "sr3",
    ):
        self.denoise_fn = denoise_fn
        self.image_size = image_size
        self.channels = channels
        self.loss_type = loss_type
        self.conditional = conditional
        self.cond_mode = cond_mode
        # optional activation-sharding hook (parallel/spatial.py): pins the
        # reverse-chain carry / training image to a spatially sharded layout
        # so GSPMD keeps H distributed at beyond-single-chip resolutions.
        # None (default) is the identity.
        self.shard_activations = None

    def _constrain(self, x):
        return self.shard_activations(x) if self.shard_activations else x

    # ------------------------------------------------------------------ loss

    def p_losses(self, params, sched: Schedule, batch, rng, train: bool = True,
                 injected=None):
        """Training loss. ``batch`` holds NHWC arrays 'HR' (+'SR' if
        conditional) in [-1, 1]. Returns scalar sum-loss / (b*h*w*c),
        identical to the reference's normalization (model/model.py:52-53).

        ``injected``: parity-test seam (mirrors ``p_sample_step``'s noise
        override) — a dict overriding the on-device draws so a torch and a
        jax training step can consume bit-identical randomness. Keys:
        ``noise`` (NHWC, like x_start) and, for sr3, ``sqrt_gamma`` (b, 1)
        or, for ddpm, ``t`` (b,) int."""
        x_start = batch["HR"]
        b, h, w, c = x_start.shape
        key_t, key_g, key_n, key_d = jax.random.split(rng, 4)
        if injected is not None and "noise" in injected:
            noise = jnp.asarray(injected["noise"], jnp.float32)
        else:
            noise = jax.random.normal(key_n, x_start.shape, dtype=jnp.float32)

        if self.cond_mode == "sr3":
            # one scalar t per step, per-sample continuous gamma within bin t
            if injected is not None and "sqrt_gamma" in injected:
                sqrt_gamma = jnp.asarray(injected["sqrt_gamma"], jnp.float32)
            else:
                t = jax.random.randint(key_t, (), 1, sched.num_timesteps + 1)
                lo = sched.sqrt_alphas_cumprod_prev[t - 1]
                hi = sched.sqrt_alphas_cumprod_prev[t]
                sqrt_gamma = jax.random.uniform(key_g, (b, 1)) * (hi - lo) + lo
            x_noisy = q_sample_gamma(x_start, sqrt_gamma, noise)
            cond_in = sqrt_gamma.reshape(b)
        else:
            if injected is not None and "t" in injected:
                t = jnp.asarray(injected["t"], jnp.int32)
            else:
                t = jax.random.randint(key_t, (b,), 0, sched.num_timesteps)
            x_noisy = q_sample_t(sched, x_start, t, noise)
            cond_in = t.astype(jnp.float32)

        if self.conditional:
            net_in = jnp.concatenate([batch["SR"], x_noisy], axis=-1)
        else:
            net_in = x_noisy
        net_in = self._constrain(net_in)

        rngs = {"dropout": key_d} if train else None
        pred = self.denoise_fn.apply(
            params, net_in, cond_in, train=train, rngs=rngs
        )

        diff = noise - pred
        if self.loss_type == "l1":
            loss = jnp.sum(jnp.abs(diff))
        elif self.loss_type == "l2":
            loss = jnp.sum(jnp.square(diff))
        else:
            raise NotImplementedError(self.loss_type)
        return loss / (b * h * w * c)

    # -------------------------------------------------------------- sampling

    def p_sample_step(self, params, sched: Schedule, img, t, key,
                      condition_x=None, clip_denoised: bool = True,
                      noise=None):
        """One reverse step x_t -> x_{t-1} (reference
        sr3_modules/diffusion.py:141-174). ``t`` may be a traced scalar.
        ``noise`` overrides the on-device draw (parity-test seam: lets an
        externally drawn stream flow through the exact production math)."""
        img = self._constrain(img)
        b = img.shape[0]
        if self.cond_mode == "sr3":
            lvl = jnp.broadcast_to(
                sched.sqrt_alphas_cumprod_prev[t + 1], (b,)
            ).astype(jnp.float32)
        else:
            lvl = jnp.broadcast_to(t, (b,)).astype(jnp.float32)

        if condition_x is not None:
            net_in = jnp.concatenate([condition_x, img], axis=-1)
        else:
            net_in = img
        eps = self.denoise_fn.apply(params, net_in, lvl, train=False)

        x_recon = (
            sched.sqrt_recip_alphas_cumprod[t] * img
            - sched.sqrt_recipm1_alphas_cumprod[t] * eps
        )
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)

        mean = (
            sched.posterior_mean_coef1[t] * x_recon
            + sched.posterior_mean_coef2[t] * img
        )
        log_var = sched.posterior_log_variance_clipped[t]
        if noise is None:
            noise = jax.random.normal(key, img.shape, dtype=jnp.float32)
        nonzero = jnp.asarray(t > 0, jnp.float32)
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_loop(self, params, sched: Schedule, x_in, rng,
                      continuous: bool = False, clip_denoised: bool = True,
                      noise_stream=None):
        """Full reverse chain as a single lax.scan.

        ``x_in``: condition image (b,h,w,c) when conditional, else a shape
        tuple. Returns the final image (b,h,w,c), or — when ``continuous`` —
        the stacked process frames ((1+n_snap)*b, h, w, c): frame 0 is the
        input condition (or the initial noise when unconditional), matching
        reference sr3_modules/diffusion.py:176-200.

        ``noise_stream``: optional ``(init_noise, step_noises)`` with shapes
        ``shape`` and ``(T,) + shape`` replacing every on-device draw —
        step_noises[i] feeds scan position i (t = T-1-i). This is the
        golden-parity seam: the torch reference's randn stream injected here
        must reproduce its output bit-for-step through this exact compiled
        scan (tests/test_torch_parity.py).
        """
        T = sched.num_timesteps
        n_snap, inter = _snapshot_count(T)

        if self.conditional:
            condition_x = x_in
            shape = x_in.shape
        else:
            condition_x = None
            shape = tuple(x_in)
        b = shape[0]

        if noise_stream is None:
            key_init, key_chain = jax.random.split(rng)
            img0 = jax.random.normal(key_init, shape, dtype=jnp.float32)
            step_noises = None
        else:
            img0, step_noises = noise_stream
            img0 = jnp.asarray(img0, jnp.float32)
            step_noises = jnp.asarray(step_noises, jnp.float32)
            key_chain = rng

        ts = jnp.arange(T - 1, -1, -1)
        xs = ts if step_noises is None else (ts, step_noises)

        def unpack(x):
            return (x, None) if step_noises is None else x

        if continuous:
            snaps0 = jnp.zeros((n_snap,) + shape, jnp.float32)

            def step(carry, x):
                t, noise = unpack(x)
                img, key, snaps = carry
                key, sub = jax.random.split(key)
                img = self.p_sample_step(
                    params, sched, img, t, sub, condition_x, clip_denoised,
                    noise=noise,
                )
                write_idx = (n_snap - 1) - t // inter
                snaps = jax.lax.cond(
                    t % inter == 0,
                    lambda s: jax.lax.dynamic_update_slice(
                        s, img[None], (write_idx, 0, 0, 0, 0)
                    ),
                    lambda s: s,
                    snaps,
                )
                return (img, key, snaps), None

            (img, _, snaps), _ = jax.lax.scan(
                step, (img0, key_chain, snaps0), xs
            )
            first = condition_x if self.conditional else img0
            frames = jnp.concatenate([first[None], snaps], axis=0)
            return frames.reshape((-1,) + shape[1:])

        def step(carry, x):
            t, noise = unpack(x)
            img, key = carry
            key, sub = jax.random.split(key)
            img = self.p_sample_step(
                params, sched, img, t, sub, condition_x, clip_denoised,
                noise=noise,
            )
            return (img, key), None

        (img, _), _ = jax.lax.scan(step, (img0, key_chain), xs)
        return self._constrain(img)

    def _eps_at(self, params, sched: Schedule, img, t, condition_x, b):
        """eps prediction at timestep index t with the mode's conditioning
        convention (continuous sqrt-gamma for sr3, integer t for ddpm) —
        shared by the strided samplers (DDIM, DPM-Solver++)."""
        img = self._constrain(img)
        if self.cond_mode == "sr3":
            lvl = jnp.broadcast_to(
                sched.sqrt_alphas_cumprod_prev[t + 1], (b,)
            ).astype(jnp.float32)
        else:
            lvl = jnp.broadcast_to(t, (b,)).astype(jnp.float32)
        net_in = (
            jnp.concatenate([condition_x, img], axis=-1)
            if condition_x is not None else img
        )
        return self.denoise_fn.apply(params, net_in, lvl, train=False)

    def ddim_sample_loop(self, params, sched: Schedule, x_in, rng,
                         n_steps: int = 50, eta: float = 0.0,
                         continuous: bool = False,
                         clip_denoised: bool = True):
        """DDIM sampling (Song et al. 2020) over a strided sub-schedule —
        a capability beyond the reference: the same trained eps-model sampled
        in n_steps (e.g. 50) instead of T (2000), one lax.scan, eta=0 fully
        deterministic given the initial noise.

        Conditioning matches the ancestral path per mode: continuous
        sqrt-gamma for sr3, integer t for ddpm."""
        import numpy as np_

        T = sched.num_timesteps
        n_steps = min(n_steps, T)
        tau = np_.unique(
            np_.linspace(0, T - 1, n_steps).round().astype(np_.int64)
        )  # ascending
        S = len(tau)

        if self.conditional:
            condition_x = x_in
            shape = x_in.shape
        else:
            condition_x = None
            shape = tuple(x_in)
        b = shape[0]

        # per-step coefficient tables: tau is static, the schedule may be a
        # traced pytree (called under jit) -> gather with jnp
        tau_idx = jnp.asarray(tau, jnp.int32)
        abar_asc = sched.alphas_cumprod[tau_idx].astype(jnp.float32)
        abar_prev_asc = jnp.concatenate(
            [jnp.ones((1,), jnp.float32), abar_asc[:-1]]
        )
        abar = abar_asc[::-1]
        abar_prev = abar_prev_asc[::-1]
        sigma = (
            eta
            * jnp.sqrt((1 - abar_prev) / (1 - abar))
            * jnp.sqrt(1 - abar / abar_prev)
        )
        dir_coef = jnp.sqrt(jnp.maximum(1 - abar_prev - sigma ** 2, 0.0))
        ts_desc = jnp.asarray(tau[::-1].copy(), jnp.int32)

        xs = (ts_desc, abar, abar_prev, sigma, dir_coef)

        key_init, key_chain = jax.random.split(rng)
        img0 = jax.random.normal(key_init, shape, dtype=jnp.float32)

        n_snap, inter = _snapshot_count(S)

        def eps_fn(img, t):
            return self._eps_at(params, sched, img, t, condition_x, b)

        def ddim_step(img, t, ab, ab_prev, sig, dirc, key):
            eps = eps_fn(img, t)
            x0 = (img - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
                # re-derive eps from the clipped x0 so the update stays
                # consistent (matches the ancestral chain's q_posterior
                # parameterization at S=T, eta=1)
                eps = (img - jnp.sqrt(ab) * x0) / jnp.sqrt(1.0 - ab)
            noise = jax.random.normal(key, img.shape, dtype=jnp.float32)
            return jnp.sqrt(ab_prev) * x0 + dirc * eps + sig * noise

        if continuous:
            snaps0 = jnp.zeros((n_snap,) + shape, jnp.float32)

            def step(carry, x):
                img, key, snaps, i = carry
                t, ab, ab_prev, sig, dirc = x
                key, sub = jax.random.split(key)
                img = ddim_step(img, t, ab, ab_prev, sig, dirc, sub)
                # i counts down S-1..0 like the ancestral loop's t
                write_idx = (n_snap - 1) - i // inter
                snaps = jax.lax.cond(
                    i % inter == 0,
                    lambda s: jax.lax.dynamic_update_slice(
                        s, img[None], (write_idx, 0, 0, 0, 0)
                    ),
                    lambda s: s,
                    snaps,
                )
                return (img, key, snaps, i - 1), None

            (img, _, snaps, _), _ = jax.lax.scan(
                step, (img0, key_chain, snaps0, jnp.int32(S - 1)), xs
            )
            first = condition_x if self.conditional else img0
            frames = jnp.concatenate([first[None], snaps], axis=0)
            return frames.reshape((-1,) + shape[1:])

        def step(carry, x):
            img, key = carry
            t, ab, ab_prev, sig, dirc = x
            key, sub = jax.random.split(key)
            img = ddim_step(img, t, ab, ab_prev, sig, dirc, sub)
            return (img, key), None

        (img, _), _ = jax.lax.scan(step, (img0, key_chain), xs)
        return self._constrain(img)

    def dpmpp_sample_loop(self, params, sched: Schedule, x_in, rng,
                          n_steps: int = 25, eta: float = 0.0,
                          continuous: bool = False,
                          clip_denoised: bool = True):
        """DPM-Solver++(2M) sampling (Lu et al. 2022, arXiv:2211.01095) —
        a second-order multistep solver in data-prediction form, beyond
        the reference's capabilities. Same trained eps-model, ~2-4x fewer
        steps than DDIM at matched sample quality (order 2 vs order 1 in the
        half-log-SNR step h).

        ``eta`` selects the variant, mirroring the DDIM knob's semantics:
        0 (default) = the probability-flow ODE solver, fully deterministic
        given the initial noise; >0 = SDE-DPM-Solver++(2M), which re-injects
        noise each step like the ancestral chain (the reverse SDE's
        contraction corrects off-manifold drift; use eta=1 — intermediate
        values scale the noise term below its SDE level and are heuristic).

        One lax.scan; each step costs exactly one denoiser forward (the
        second-order correction reuses the previous step's x0 prediction
        from the carry). The final jump to the clean image runs first-order
        (the 2M correction coefficient h/h_prev diverges as
        lambda(abar->1) -> inf), standard lower-order-final practice."""
        import numpy as np_

        T = sched.num_timesteps
        n_steps = min(n_steps, T)
        tau = np_.unique(
            np_.linspace(0, T - 1, n_steps).round().astype(np_.int64)
        )
        S = len(tau)

        if self.conditional:
            condition_x = x_in
            shape = x_in.shape
        else:
            condition_x = None
            shape = tuple(x_in)
        b = shape[0]

        # Per-step tables in sampling (descending-t) order. At loop index i
        # the model is evaluated at tau_desc[i] and the state moves to
        # tau_desc[i+1] (the clean image after the last step). With
        # alpha = sqrt(abar), sigma = sqrt(1-abar),
        # lambda = log(alpha/sigma), h_i = lambda_next - lambda_cur > 0:
        #   x <- (sig_next/sig_cur) x + alpha_next (1 - e^{-h}) D
        #   D  = x0_i + (h_i / (2 h_{i-1})) (x0_i - x0_{i-1})   [2M]
        tau_desc = jnp.asarray(tau[::-1].copy(), jnp.int32)
        abar_cur = sched.alphas_cumprod[tau_desc].astype(jnp.float32)
        abar_next = jnp.concatenate(
            [abar_cur[1:], jnp.ones((1,), jnp.float32)]
        )
        a_cur, s_cur = jnp.sqrt(abar_cur), jnp.sqrt(1.0 - abar_cur)
        a_next = jnp.sqrt(abar_next)
        s_next = jnp.sqrt(1.0 - abar_next)
        lam_cur = jnp.log(a_cur) - jnp.log(s_cur)
        # the final s_next is 0 (lambda -> inf); a finite stand-in keeps the
        # arithmetic NaN-free and the last-step coefficients are then set to
        # their exact sigma->0 limits below
        lam_next = jnp.log(a_next) - jnp.log(jnp.maximum(s_next, 1e-20))
        h = lam_next - lam_cur
        h_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), h[:-1]])

        if eta > 0.0:
            # SDE-DPM-Solver++(2M): exponential-integrator discretization of
            # the reverse SDE (same paper, eq. for sde-dpmsolver++)
            c_lin = (s_next / s_cur) * jnp.exp(-h)
            c_d = a_next * (1.0 - jnp.exp(-2.0 * h))
            c_noise = (
                eta * s_next * jnp.sqrt(1.0 - jnp.exp(-2.0 * h))
            )
        else:
            c_lin = s_next / s_cur
            c_d = a_next * (1.0 - jnp.exp(-h))
            c_noise = jnp.zeros_like(c_lin)
        c_d1 = 0.5 * c_d * (h / h_prev)
        c_d1 = c_d1.at[0].set(0.0)   # no history at the first step
        # final step, exact sigma_next=0 limit: x = x0 prediction,
        # first-order (lower_order_final)
        c_lin = c_lin.at[-1].set(0.0)
        c_d = c_d.at[-1].set(1.0)
        c_d1 = c_d1.at[-1].set(0.0)
        c_noise = c_noise.at[-1].set(0.0)

        key_init, key_chain = jax.random.split(rng)
        img0 = jax.random.normal(key_init, shape, dtype=jnp.float32)

        def solver_step(img, x0_prev, key, t, a, s, cl, cd, cd1, cn):
            eps = self._eps_at(params, sched, img, t, condition_x, b)
            x0 = (img - s * eps) / a
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            z = jax.random.normal(key, img.shape, dtype=jnp.float32)
            img = cl * img + cd * x0 + cd1 * (x0 - x0_prev) + cn * z
            return img, x0

        xs = (tau_desc, a_cur, s_cur, c_lin, c_d, c_d1, c_noise)
        n_snap, inter = _snapshot_count(S)

        if continuous:
            snaps0 = jnp.zeros((n_snap,) + shape, jnp.float32)

            def step(carry, x):
                img, x0_prev, key, snaps, i = carry
                key, sub = jax.random.split(key)
                img, x0 = solver_step(img, x0_prev, sub, *x)
                write_idx = (n_snap - 1) - i // inter
                snaps = jax.lax.cond(
                    i % inter == 0,
                    lambda s_: jax.lax.dynamic_update_slice(
                        s_, img[None], (write_idx, 0, 0, 0, 0)
                    ),
                    lambda s_: s_,
                    snaps,
                )
                return (img, x0, key, snaps, i - 1), None

            (img, _, _, snaps, _), _ = jax.lax.scan(
                step,
                (img0, jnp.zeros(shape, jnp.float32), key_chain, snaps0,
                 jnp.int32(S - 1)),
                xs,
            )
            first = condition_x if self.conditional else img0
            frames = jnp.concatenate([first[None], snaps], axis=0)
            return frames.reshape((-1,) + shape[1:])

        def step(carry, x):
            img, x0_prev, key = carry
            key, sub = jax.random.split(key)
            img, x0 = solver_step(img, x0_prev, sub, *x)
            return (img, x0, key), None

        (img, _, _), _ = jax.lax.scan(
            step, (img0, jnp.zeros(shape, jnp.float32), key_chain), xs
        )
        return self._constrain(img)

    def sample(self, params, sched, rng, batch_size=1, continuous=False):
        """Unconditional generation (reference sr3_modules/diffusion.py:202-206)."""
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        return self.p_sample_loop(params, sched, shape, rng, continuous)

    def super_resolution(self, params, sched, x_sr, rng, continuous=False):
        """Conditional SR from the bicubic-upsampled LR image
        (reference sr3_modules/diffusion.py:208-210)."""
        return self.p_sample_loop(params, sched, x_sr, rng, continuous)

    def interpolate(self, params, sched: Schedule, x1, x2, rng,
                    t: Optional[int] = None, lam: float = 0.5):
        """Latent-space blend of two images then reverse diffusion
        (reference ddpm_modules/diffusion.py:242-257; ddpm mode only)."""
        assert self.cond_mode == "ddpm", "interpolate is a DDPM-mode API"
        T = sched.num_timesteps
        t = T - 1 if t is None else int(t)
        b = x1.shape[0]
        k1, k2, kc = jax.random.split(rng, 3)
        tb = jnp.full((b,), t, jnp.int32)
        xt1 = q_sample_t(sched, x1, tb, jax.random.normal(k1, x1.shape))
        xt2 = q_sample_t(sched, x2, tb, jax.random.normal(k2, x2.shape))
        img = (1 - lam) * xt1 + lam * xt2

        def step(carry, ti):
            im, key = carry
            key, sub = jax.random.split(key)
            im = self.p_sample_step(params, sched, im, ti, sub, None, True)
            return (im, key), None

        ts = jnp.arange(t - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img, kc), ts)
        return img
