"""Performance scan on the current backend: sampler step time vs batch size,
train-step time, and kernel dispatch variants. Run on the real TPU chip.

  python tools/perfscan.py [--batches 1,4,8,16] [--steps 50]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax.numpy as jnp
import optax


def timed(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--train-batches", default="4,8,16")
    args = ap.parse_args()

    from sr3_tpu.models.networks import define_G, init_params
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

    opt = dict_to_nonedict(load_json_with_comments("configs/sr_sr3_16_128.json"))
    opt["phase"] = "val"
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    sched = make_schedule(
        {"schedule": "linear", "n_timestep": args.steps,
         "linear_start": 1e-6, "linear_end": 1e-2}
    )
    print(f"backend={jax.default_backend()} dtype={diffusion.denoise_fn.dtype}")

    print("\n-- sampler: ms/step and img/s (normalized to 2000-step chain)")
    for b in [int(x) for x in args.batches.split(",")]:
        x = jnp.zeros((b, 128, 128, 3), jnp.float32)
        fn = jax.jit(
            lambda p, x, k: diffusion.super_resolution(p, sched, x, k, False)
        )
        dt = timed(fn, params, x, jax.random.PRNGKey(0))
        ms_step = dt / args.steps * 1e3
        print(f"batch {b:3d}: {ms_step:7.2f} ms/step  "
              f"{b / (ms_step * 2):7.4f} img/s @2000")

    print("\n-- train step: ms/step")
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    for b in [int(x) for x in args.train_batches.split(",")]:
        batch = {
            "HR": jnp.zeros((b, 128, 128, 3), jnp.float32),
            "SR": jnp.zeros((b, 128, 128, 3), jnp.float32),
        }

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, o, batch, k):
            loss, g = jax.value_and_grad(
                lambda q: diffusion.p_losses(q, sched, batch, k, train=True)
            )(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, loss

        # donated steps consume their inputs: chain state through the loop
        p, o = jax.tree_util.tree_map(jnp.array, (params, opt_state))
        k = jax.random.PRNGKey(0)
        p, o, loss = step(p, o, batch, k)  # compile + warmup
        jax.block_until_ready(loss)
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            p, o, loss = step(p, o, batch, k)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / iters
        print(f"batch {b:3d}: {dt * 1e3:7.2f} ms/step  "
              f"{b / dt:7.2f} img/s")


if __name__ == "__main__":
    main()
