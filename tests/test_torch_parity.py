"""Golden parity vs the PyTorch reference implementation.

Loads the reference UNet (torch, CPU) from /root/reference, transfers its
weights into the flax UNet via torch_compat, and compares forward outputs —
the strongest structural/numerical check available without trained weights.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _import_ref_unet(which):
    sys.path.insert(0, os.path.join(REF, "model", f"{which}_modules"))
    try:
        import importlib

        import unet as ref_unet

        importlib.reload(ref_unet)
        return ref_unet
    finally:
        sys.path.pop(0)


SMALL = dict(
    in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
    channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
    image_size=16,
)


def _build_pair(cond_mode):
    from sr3_tpu.models.unet import UNet

    ref_unet = _import_ref_unet(cond_mode)
    kwargs = dict(SMALL)
    torch.manual_seed(0)
    if cond_mode == "sr3":
        ref = ref_unet.UNet(
            in_channel=kwargs["in_channel"], out_channel=kwargs["out_channel"],
            inner_channel=kwargs["inner_channel"],
            norm_groups=kwargs["norm_groups"],
            channel_mults=kwargs["channel_mults"], attn_res=kwargs["attn_res"],
            res_blocks=kwargs["res_blocks"], dropout=0,
            with_noise_level_emb=True, image_size=kwargs["image_size"],
        )
    else:
        ref = ref_unet.UNet(
            in_channel=kwargs["in_channel"], out_channel=kwargs["out_channel"],
            inner_channel=kwargs["inner_channel"],
            norm_groups=kwargs["norm_groups"],
            channel_mults=kwargs["channel_mults"], attn_res=kwargs["attn_res"],
            res_blocks=kwargs["res_blocks"], dropout=0,
            with_time_emb=True, image_size=kwargs["image_size"],
        )
    ref.eval()
    ours = UNet(cond_mode=cond_mode, **kwargs)
    return ref, ours


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_param_count_parity(cond_mode):
    import jax

    ref, ours = _build_pair(cond_mode)
    n_ref = sum(p.numel() for p in ref.parameters())
    params = ours.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((1, 16, 16, 6), np.float32),
        np.ones((1,), np.float32),
        train=False,
    )
    n_ours = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_ref == n_ours, f"{n_ref} (torch) != {n_ours} (flax)"


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_forward_parity_with_transferred_weights(cond_mode):
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    ref, ours = _build_pair(cond_mode)
    params = torch_state_dict_to_flax(
        {k: v.detach() for k, v in ref.state_dict().items()},
        in_channel=SMALL["in_channel"],
        inner_channel=SMALL["inner_channel"],
        channel_mults=SMALL["channel_mults"],
        attn_res=SMALL["attn_res"],
        res_blocks=SMALL["res_blocks"],
        image_size=SMALL["image_size"],
        cond_mode=cond_mode,
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 6), dtype=np.float32)
    cond = (
        np.asarray([0.3, 0.8], np.float32)
        if cond_mode == "sr3"
        else np.asarray([3.0, 7.0], np.float32)
    )

    with torch.no_grad():
        x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        if cond_mode == "sr3":
            c_t = torch.from_numpy(cond.reshape(-1, 1))
        else:
            c_t = torch.from_numpy(cond)
        out_ref = ref(x_t, c_t).numpy()
    out_ref = np.transpose(out_ref, (0, 2, 3, 1))

    out_ours = np.asarray(ours.apply(params, x, cond, train=False))
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=1e-3)


def _make_ref_diffusion(cond_mode, ref_unet_model, T=10, conditional=True):
    import importlib

    sys.path.insert(0, os.path.join(REF, "model", f"{cond_mode}_modules"))
    try:
        import diffusion as ref_diff_mod

        importlib.reload(ref_diff_mod)
        ref_diff = ref_diff_mod.GaussianDiffusion(
            ref_unet_model, image_size=16, channels=3, loss_type="l1",
            conditional=conditional,
        )
        ref_diff.set_loss(torch.device("cpu"))
        ref_diff.set_new_noise_schedule(
            {"schedule": "linear", "n_timestep": T,
             "linear_start": 1e-6, "linear_end": 1e-2},
            torch.device("cpu"),
        )
        return ref_diff
    finally:
        sys.path.pop(0)


class _NoiseQueue:
    """Replaces torch.randn/randn_like with pops from a pre-drawn stream so
    the reference's sampling loop consumes a known noise sequence."""

    def __init__(self, tensors):
        self.queue = list(tensors)
        self.popped = 0

    def randn(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        t = self.queue.pop(0)
        self.popped += 1
        assert tuple(t.shape) == tuple(shape), (t.shape, shape)
        return t.clone()

    def randn_like(self, x, **kw):
        return self.randn(*x.shape)


def _run_ref_chain_with_stream(ref_diff, x_in, stream, continous):
    """Run the reference p_sample_loop with torch.randn/randn_like
    monkeypatched to the stream (reference sr3_modules/diffusion.py:176-200
    draws init noise + one randn_like per step with t > 0)."""
    q = _NoiseQueue(stream)
    saved = (torch.randn, torch.randn_like)
    torch.randn, torch.randn_like = q.randn, q.randn_like
    try:
        with torch.no_grad():
            if ref_diff.conditional:
                out = ref_diff.super_resolution(x_in, continous=continous)
            else:
                out = ref_diff.p_sample_loop(x_in, continous=continous)
    finally:
        torch.randn, torch.randn_like = saved
    return out.numpy(), q


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_full_chain_parity_conditional(cond_mode):
    """THE full-chain golden test (VERDICT r2 next-round #1): one identical
    noise stream through the reference's Python sampling loop and through
    this framework's single compiled lax.scan; every frame of the process
    stack (snapshot indexing included) must agree. Certifies the whole
    p_sample_loop program, not just one step."""
    import jax

    from sr3_tpu.models.diffusion import GaussianDiffusion
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    T = 10
    ref, ours = _build_pair(cond_mode)
    params = torch_state_dict_to_flax(
        {k: v.detach() for k, v in ref.state_dict().items()},
        in_channel=6, inner_channel=16, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, image_size=16, cond_mode=cond_mode,
    )
    ref_diff = _make_ref_diffusion(cond_mode, ref, T=T)
    sched = make_schedule({"schedule": "linear", "n_timestep": T,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    diff = GaussianDiffusion(ours, image_size=16, conditional=True,
                             cond_mode=cond_mode)

    rng = np.random.default_rng(5)
    cond = rng.standard_normal((1, 16, 16, 3)).astype(np.float32) * 0.5
    init = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    steps = rng.standard_normal((T, 1, 16, 16, 3)).astype(np.float32)

    # torch consumption order: init randn, then one per step in t-descending
    # order — sr3 draws only while t > 0 (randn_like, diffusion.py:173);
    # ddpm draws every step incl. t=0 and masks it (noise_like, :194-198)
    n_step_draws = T if cond_mode == "ddpm" else T - 1
    stream = [torch.from_numpy(np.transpose(init, (0, 3, 1, 2)))]
    stream += [
        torch.from_numpy(np.transpose(steps[i], (0, 3, 1, 2)))
        for i in range(n_step_draws)
    ]
    cond_t = torch.from_numpy(np.transpose(cond, (0, 3, 1, 2)))
    frames_ref, q = _run_ref_chain_with_stream(
        ref_diff, cond_t, stream, continous=True
    )
    assert not q.queue, "reference did not consume the whole stream"
    frames_ref = np.transpose(frames_ref, (0, 2, 3, 1))

    frames_ours = np.asarray(
        jax.jit(
            lambda p, x, ns: diff.p_sample_loop(
                p, sched, x, jax.random.PRNGKey(0), continuous=True,
                noise_stream=ns,
            )
        )(params, cond, (init, steps))
    )
    assert frames_ours.shape == frames_ref.shape  # (1+T snapshots) at T=10
    np.testing.assert_allclose(frames_ours, frames_ref, atol=5e-4, rtol=1e-3)

    # final-image (non-continuous) path must agree with the last frame
    final_ours = np.asarray(
        jax.jit(
            lambda p, x, ns: diff.p_sample_loop(
                p, sched, x, jax.random.PRNGKey(0), continuous=False,
                noise_stream=ns,
            )
        )(params, cond, (init, steps))
    )
    np.testing.assert_allclose(final_ours, frames_ref[-1:], atol=5e-4,
                               rtol=1e-3)


def test_full_chain_parity_unconditional_sr3():
    """Unconditional branch of the chain (reference
    sr3_modules/diffusion.py:180-187): frame 0 is the initial noise."""
    import jax

    from sr3_tpu.models.diffusion import GaussianDiffusion
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    T = 10
    kwargs = dict(SMALL, in_channel=3)
    ref_unet = _import_ref_unet("sr3")
    torch.manual_seed(0)
    ref = ref_unet.UNet(
        in_channel=3, out_channel=3, inner_channel=16, norm_groups=8,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
        with_noise_level_emb=True, image_size=16,
    )
    ref.eval()
    from sr3_tpu.models.unet import UNet

    ours = UNet(cond_mode="sr3", **kwargs)
    params = torch_state_dict_to_flax(
        {k: v.detach() for k, v in ref.state_dict().items()},
        in_channel=3, inner_channel=16, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, image_size=16, cond_mode="sr3",
    )
    ref_diff = _make_ref_diffusion("sr3", ref, T=T, conditional=False)
    sched = make_schedule({"schedule": "linear", "n_timestep": T,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    diff = GaussianDiffusion(ours, image_size=16, conditional=False,
                             cond_mode="sr3")

    rng = np.random.default_rng(6)
    init = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    steps = rng.standard_normal((T, 1, 16, 16, 3)).astype(np.float32)
    stream = [torch.from_numpy(np.transpose(init, (0, 3, 1, 2)))]
    stream += [
        torch.from_numpy(np.transpose(steps[i], (0, 3, 1, 2)))
        for i in range(T - 1)
    ]
    frames_ref, q = _run_ref_chain_with_stream(
        ref_diff, (1, 3, 16, 16), stream, continous=True
    )
    assert not q.queue
    frames_ref = np.transpose(frames_ref, (0, 2, 3, 1))

    frames_ours = np.asarray(
        diff.p_sample_loop(
            params, sched, (1, 16, 16, 3), jax.random.PRNGKey(0),
            continuous=True, noise_stream=(init, steps),
        )
    )
    assert frames_ours.shape == frames_ref.shape
    np.testing.assert_allclose(frames_ours, frames_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_diffusion_p_sample_parity(cond_mode):
    """One reverse step with transferred weights must match the reference's
    p_mean_variance + noiseless p_sample at t=0 (deterministic branch)."""
    import importlib

    import jax

    from sr3_tpu.models.diffusion import GaussianDiffusion
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    ref, ours = _build_pair(cond_mode)
    params = torch_state_dict_to_flax(
        {k: v.detach() for k, v in ref.state_dict().items()},
        in_channel=6, inner_channel=16, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, image_size=16, cond_mode=cond_mode,
    )

    sys.path.insert(0, os.path.join(REF, "model", f"{cond_mode}_modules"))
    try:
        import diffusion as ref_diff_mod

        importlib.reload(ref_diff_mod)
        ref_diff = ref_diff_mod.GaussianDiffusion(
            ref, image_size=16, channels=3, loss_type="l1", conditional=True
        )
        ref_diff.set_loss(torch.device("cpu"))
        ref_diff.set_new_noise_schedule(
            {"schedule": "linear", "n_timestep": 10,
             "linear_start": 1e-6, "linear_end": 1e-2},
            torch.device("cpu"),
        )
    finally:
        sys.path.pop(0)

    sched = make_schedule({"schedule": "linear", "n_timestep": 10,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    diff = GaussianDiffusion(ours, image_size=16, conditional=True,
                             cond_mode=cond_mode)

    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
    cond_img = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)

    with torch.no_grad():
        img_t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        cond_t = torch.from_numpy(np.transpose(cond_img, (0, 3, 1, 2)))
        if cond_mode == "sr3":
            mean_ref, _ = ref_diff.p_mean_variance(
                img_t, 0, clip_denoised=True, condition_x=cond_t
            )
        else:
            mean_ref, _, _ = ref_diff.p_mean_variance(
                img_t, torch.zeros(1, dtype=torch.long),
                clip_denoised=True, condition_x=cond_t,
            )
        # t=0: p_sample adds no noise -> output == mean
        out_ref = np.transpose(mean_ref.numpy(), (0, 2, 3, 1))

    out_ours = np.asarray(
        diff.p_sample_step(
            params, sched, img, 0, jax.random.PRNGKey(0), cond_img, True
        )
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("cond_mode", ["sr3", "ddpm"])
def test_train_step_parity_locked_randomness(cond_mode):
    """Step-locked TRAINING parity (round 4): identical init (transferred
    weights), identical batch, and identical (gamma/t, noise) draws injected
    into both frameworks' p_losses; both sides take real Adam steps. The
    per-step loss sequences must track within float32 tolerance — this
    certifies gradients + optimizer dynamics, not just the forward pass,
    and is the step-locked complement to the statistical head-to-head
    (docs/QUALITY_r04.json). Reference loss paths:
    model/sr3_modules/diffusion.py:221-246 (np.random t/gamma draws, replayed
    by reseeding), model/ddpm_modules/diffusion.py:278-294 (torch.randint t
    draw, replayed by monkeypatch), + model/model.py:50-53."""
    import jax
    import jax.numpy as jnp
    import optax

    from sr3_tpu.models.diffusion import GaussianDiffusion
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    T, STEPS, LR = 10, 15, 1e-4
    ref, ours = _build_pair(cond_mode)
    ref.train()
    params = torch_state_dict_to_flax(
        {k: v.detach() for k, v in ref.state_dict().items()},
        in_channel=SMALL["in_channel"], inner_channel=SMALL["inner_channel"],
        channel_mults=SMALL["channel_mults"], attn_res=SMALL["attn_res"],
        res_blocks=SMALL["res_blocks"], image_size=SMALL["image_size"],
        cond_mode=cond_mode,
    )
    ref_diff = _make_ref_diffusion(cond_mode, ref, T=T, conditional=True)

    sched = make_schedule({"schedule": "linear", "n_timestep": T,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    diff = GaussianDiffusion(ours, image_size=16, conditional=True,
                             cond_mode=cond_mode)

    opt_t = torch.optim.Adam(ref.parameters(), lr=LR)
    tx = optax.adam(LR)  # same defaults as torch.optim.Adam: b=(0.9,.999), eps=1e-8
    opt_state = tx.init(params)

    rng = np.random.default_rng(7)
    b = 2
    hr = rng.standard_normal((b, 16, 16, 3)).astype(np.float32) * 0.5
    sr = rng.standard_normal((b, 16, 16, 3)).astype(np.float32) * 0.5
    batch = {"HR": jnp.asarray(hr), "SR": jnp.asarray(sr)}
    hr_t = torch.from_numpy(np.transpose(hr, (0, 3, 1, 2)))
    sr_t = torch.from_numpy(np.transpose(sr, (0, 3, 1, 2)))

    @jax.jit
    def jstep(params, opt_state, injected):
        def loss_fn(p):
            return diff.p_losses(
                p, sched, batch, jax.random.PRNGKey(0), train=True,
                injected=injected,
            )
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    prev = np.asarray(ref_diff.sqrt_alphas_cumprod_prev, np.float64) \
        if cond_mode == "sr3" else None
    saved_randint = torch.randint
    losses_t, losses_j = [], []
    try:
        for step in range(STEPS):
            rs = np.random.RandomState(1000 + step)
            noise = np.random.default_rng(500 + step).standard_normal(
                (b, 16, 16, 3)).astype(np.float32)
            if cond_mode == "sr3":
                t = rs.randint(1, T + 1)
                gamma = rs.uniform(prev[t - 1], prev[t],
                                   size=b).astype(np.float32)
                injected = {"sqrt_gamma": jnp.asarray(gamma.reshape(b, 1)),
                            "noise": jnp.asarray(noise)}
                # torch replays the same (t, gamma) because its p_losses
                # draws them from the reseeded numpy global RNG
                np.random.seed(1000 + step)
            else:
                t_vec = rs.randint(0, T, size=b).astype(np.int64)
                injected = {"t": jnp.asarray(t_vec),
                            "noise": jnp.asarray(noise)}
                # ddpm draws t via torch.randint: patch it to our vector
                torch.randint = (
                    lambda *a, t_vec=t_vec, **kw: torch.from_numpy(t_vec)
                )

            noise_t = torch.from_numpy(np.transpose(noise, (0, 3, 1, 2)))
            opt_t.zero_grad()
            l_pix = ref_diff({"HR": hr_t, "SR": sr_t}, noise=noise_t)
            l_pix = l_pix.sum() / int(np.prod(hr_t.shape))
            l_pix.backward()
            opt_t.step()
            losses_t.append(float(l_pix.item()))

            params, opt_state, lj = jstep(params, opt_state, injected)
            losses_j.append(float(lj))
    finally:
        torch.randint = saved_randint

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    # step 0 is pure forward+grad parity; later steps compound Adam drift
    assert abs(losses_t[0] - losses_j[0]) < 2e-4, (losses_t[0], losses_j[0])
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-3, atol=5e-4)
