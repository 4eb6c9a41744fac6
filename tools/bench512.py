"""512x512 attention-on benchmark (VERDICT round-1 item 5).

Measures, on the real chip:
  - train-step time for sr_sr3_64_512_attn (attention at 32/64 feature res,
    flash kernel, remat) vs the reference-shaped sr_sr3_64_512 (attention
    disabled) at the same batch;
  - a short sampling segment at 512^2 to project the 2000-step chain;
  - flash vs XLA attention dispatch inside the full model.

  python tools/bench512.py [--batch 2] [--steps 8] [--sample-steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax.numpy as jnp
import optax


def build(config, use_flash=None):
    from sr3_tpu.models.networks import define_G, init_params
    from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

    opt = dict_to_nonedict(load_json_with_comments(config))
    opt["phase"] = "val"
    if use_flash is not None:
        opt["model"]["unet"]["use_flash"] = use_flash
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    return opt, diffusion, params


def train_step_time(diffusion, params, sched, batch, iters):
    tx = optax.adam(3e-6)

    def step(p, o, data, k):
        loss, g = jax.value_and_grad(
            lambda q: diffusion.p_losses(q, sched, data, k, train=True)
        )(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    data = {
        "HR": jnp.zeros((batch, 512, 512, 3), jnp.float32),
        "SR": jnp.zeros((batch, 512, 512, 3), jnp.float32),
    }
    p = jax.tree_util.tree_map(jnp.array, params)
    o = tx.init(p)
    k = jax.random.PRNGKey(0)
    t0 = time.time()
    p, o, loss = jstep(p, o, data, k)
    jax.block_until_ready(loss)
    print(f"#   first train step (incl compile): {time.time() - t0:.1f}s",
          file=sys.stderr)
    p, o, loss = jstep(p, o, data, k)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(iters):
        p, o, loss = jstep(p, o, data, k)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / iters
    assert bool(jnp.isfinite(loss)), f"non-finite loss {loss}"
    return dt


def sample_time(diffusion, params, batch, n_steps):
    from sr3_tpu.models.schedule import make_schedule

    sched = make_schedule(
        {"schedule": "linear", "n_timestep": n_steps,
         "linear_start": 1e-6, "linear_end": 1e-2}
    )
    fn = jax.jit(
        lambda p, x, k: diffusion.super_resolution(p, sched, x, k, False)
    )
    x = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    t0 = time.time()
    out = fn(params, x, jax.random.PRNGKey(1))
    out.block_until_ready()
    print(f"#   first sampling run (incl compile): {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    out = fn(params, x, jax.random.PRNGKey(2))
    out.block_until_ready()
    return (time.time() - t0) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sample-steps", type=int, default=20)
    ap.add_argument("--skip-noattn", action="store_true")
    ap.add_argument("--skip-xla-attn", action="store_true")
    ap.add_argument("--skip-flash", action="store_true")
    ap.add_argument("--skip-sample", action="store_true",
                    help="train-step cell only (halves tunnel compile cost)")
    ap.add_argument("--out", default=None,
                    help="write the JSON result line to this path too")
    args = ap.parse_args()
    results = {}

    from sr3_tpu.models.schedule import make_schedule

    opt0 = None
    if not args.skip_flash:
        print("== sr_sr3_64_512_attn (flash attention @32/64, remat)",
              file=sys.stderr)
        # use_flash=True explicitly: since r05 the config defers to the
        # auto policy, which dispatches XLA at 32/64-res token counts —
        # this cell must pin the flash kernel or it measures XLA twice
        opt, diffusion, params = build("configs/sr_sr3_64_512_attn.json",
                                       use_flash=True)
        opt0 = opt
        tsched = make_schedule(opt["model"]["beta_schedule"]["train"])
        dt = train_step_time(diffusion, params, tsched, args.batch,
                             args.iters)
        results["attn_flash_train_ms"] = round(dt * 1e3, 1)
        print(f"  train: {dt * 1e3:.1f} ms/step  {args.batch / dt:.2f} img/s",
              file=sys.stderr)
        if not args.skip_sample:
            st = sample_time(diffusion, params, args.batch, args.sample_steps)
            results["attn_flash_sample_ms_per_step"] = round(st * 1e3, 2)
            results["attn_flash_sample_imgs_per_sec_2000"] = round(
                args.batch / (st * 2000), 4
            )
            print(f"  sample: {st * 1e3:.1f} ms/step "
                  f"-> {args.batch / (st * 2000):.4f} img/s @2000 steps",
                  file=sys.stderr)

    if opt0 is None:
        from sr3_tpu.utils.config import (dict_to_nonedict,
                                          load_json_with_comments)

        opt0 = dict_to_nonedict(
            load_json_with_comments("configs/sr_sr3_64_512_attn.json"))
    tsched = make_schedule(opt0["model"]["beta_schedule"]["train"])

    if not args.skip_xla_attn:
        print("== same config, XLA (materialized) attention", file=sys.stderr)
        _, dx, px = build("configs/sr_sr3_64_512_attn.json", use_flash=False)
        try:
            dt = train_step_time(dx, px, tsched, args.batch, args.iters)
            results["attn_xla_train_ms"] = round(dt * 1e3, 1)
            print(f"  train: {dt * 1e3:.1f} ms/step", file=sys.stderr)
            if not args.skip_sample:
                st = sample_time(dx, px, args.batch, args.sample_steps)
                results["attn_xla_sample_ms_per_step"] = round(st * 1e3, 2)
                print(f"  sample: {st * 1e3:.1f} ms/step", file=sys.stderr)
        except AssertionError:  # non-finite loss is a bug, not a bench cell
            raise
        except Exception as e:  # OOM is a valid result here
            results["attn_xla_error"] = str(e)[:300]
            print(f"  XLA attention failed: {e}", file=sys.stderr)

    if not args.skip_noattn:
        print("== reference-shaped sr_sr3_64_512 (attention disabled)",
              file=sys.stderr)
        _, d0, p0 = build("configs/sr_sr3_64_512.json")
        dt = train_step_time(d0, p0, tsched, args.batch, args.iters)
        results["noattn_train_ms"] = round(dt * 1e3, 1)
        print(f"  train: {dt * 1e3:.1f} ms/step", file=sys.stderr)
        if not args.skip_sample:
            st = sample_time(d0, p0, args.batch, args.sample_steps)
            results["noattn_sample_ms_per_step"] = round(st * 1e3, 2)
            print(f"  sample: {st * 1e3:.1f} ms/step", file=sys.stderr)

    results["batch"] = args.batch
    results["backend"] = jax.default_backend()
    line = json.dumps(results)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
