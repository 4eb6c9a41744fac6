"""Measure the torch reference's train step vs ours on the SAME silicon.

The reference publishes no training throughput (SURVEY §6), so BENCH's
`vs_baseline` for training needs a sourced denominator. This tool produces
the two measurable anchors:

1. torch reference train step (fwd + bwd + Adam, the exact
   model/model.py:48-58 computation) on this host's CPU;
2. our jitted JAX train step on the same CPU, same model shape and batch —
   plus XLA cost-analysis FLOPs/step, which feeds the transparent 1080Ti
   derivation documented in bench.py.

Run:  SR3_PLATFORM=cpu python tools/train_baseline.py [batch] [iters]
Writes docs/TRAIN_BASELINE_r03.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sr3_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
RES = 128

FLAGSHIP = dict(
    in_channel=6, out_channel=3, inner_channel=64, norm_groups=32,
    channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
    image_size=RES,
)


def bench_torch():
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference/model/sr3_modules")
    try:
        import importlib

        import diffusion as ref_diff_mod
        import unet as ref_unet

        importlib.reload(ref_unet)
        importlib.reload(ref_diff_mod)
        torch.manual_seed(0)
        net = ref_unet.UNet(dropout=0.2, with_noise_level_emb=True, **FLAGSHIP)
        diff = ref_diff_mod.GaussianDiffusion(
            net, image_size=RES, channels=3, loss_type="l1", conditional=True
        )
        diff.set_loss(torch.device("cpu"))
        diff.set_new_noise_schedule(
            {"schedule": "linear", "n_timestep": 2000,
             "linear_start": 1e-6, "linear_end": 1e-2},
            torch.device("cpu"),
        )
    finally:
        sys.path.pop(0)

    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    rng = np.random.default_rng(0)
    data = {
        "HR": torch.from_numpy(
            rng.standard_normal((BATCH, 3, RES, RES)).astype("float32")),
        "SR": torch.from_numpy(
            rng.standard_normal((BATCH, 3, RES, RES)).astype("float32")),
    }

    def step():
        # the exact reference optimize_parameters (model/model.py:48-58)
        opt.zero_grad()
        l_pix = diff(data)
        b, c, h, w = data["HR"].shape
        l_pix = l_pix.sum() / int(b * c * h * w)
        l_pix.backward()
        opt.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(ITERS):
        step()
    dt = (time.time() - t0) / ITERS
    print(f"# torch: {dt:.2f} s/step at batch {BATCH}", file=sys.stderr)
    return dt


def bench_jax():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sr3_tpu.models.diffusion import GaussianDiffusion
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.models.unet import UNet

    unet = UNet(cond_mode="sr3", dropout=0.2, dtype=jnp.float32, **FLAGSHIP)
    diff = GaussianDiffusion(unet, image_size=RES, conditional=True)
    sched = make_schedule({"schedule": "linear", "n_timestep": 2000,
                           "linear_start": 1e-6, "linear_end": 1e-2})
    params = unet.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((1, RES, RES, 6), np.float32), np.ones((1,), np.float32),
        train=False,
    )
    tx = optax.adam(1e-4)

    def step(p, o, batch, k):
        loss, g = jax.value_and_grad(
            lambda q: diff.p_losses(q, sched, batch, k, train=True))(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    data = {
        "HR": jnp.asarray(
            rng.standard_normal((BATCH, RES, RES, 3)).astype("float32")),
        "SR": jnp.asarray(
            rng.standard_normal((BATCH, RES, RES, 3)).astype("float32")),
    }
    o = tx.init(params)
    t0 = time.time()
    compiled = jstep.lower(params, o, data, jax.random.PRNGKey(0)).compile()
    print(f"# jax compile: {time.time() - t0:.0f}s", file=sys.stderr)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        flops = None

    p, o2, loss = compiled(params, o, data, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(ITERS):
        p, o2, loss = compiled(p, o2, data, jax.random.PRNGKey(1 + i))
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / ITERS
    print(f"# jax: {dt:.2f} s/step at batch {BATCH}, flops/step={flops}",
          file=sys.stderr)
    return dt, flops


def main():
    torch_dt = bench_torch()
    jax_dt, flops = bench_jax()
    out = {
        "host": "1-core CPU (same silicon for both frameworks)",
        "model": "sr_sr3_16_128 flagship UNet (97.8M params)",
        "batch": BATCH,
        "iters": ITERS,
        "torch_s_per_step": round(torch_dt, 3),
        "jax_s_per_step": round(jax_dt, 3),
        "jax_vs_torch_same_host": round(torch_dt / jax_dt, 3),
        "train_flops_per_step_xla": flops,
        "train_gflops_per_img": round(flops / BATCH / 1e9, 1) if flops else None,
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/TRAIN_BASELINE_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
