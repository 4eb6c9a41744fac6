"""Probe: attention at the 128x128 feature map of the 64->512 model
(16384 tokens) — the regime where materialized (XLA) attention cannot hold
the (HW)^2 matrix and the Pallas flash kernel is load-bearing.

  python tools/bench_attn128.py [--batch 1] [--iters 4] [--xla]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--xla", action="store_true",
                    help="use materialized XLA attention instead of flash")
    ap.add_argument("--out", default=None,
                    help="write the JSON result line to this path too")
    args = ap.parse_args()

    from sr3_tpu.models.networks import define_G, init_params
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

    opt = dict_to_nonedict(
        load_json_with_comments("configs/sr_sr3_64_512_attn.json")
    )
    opt["phase"] = "val"
    opt["model"]["unet"]["attn_res"] = [32, 64, 128]
    opt["model"]["unet"]["use_flash"] = not args.xla
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    sched = make_schedule(opt["model"]["beta_schedule"]["train"])

    tx = optax.adam(3e-6)

    def step(p, o, data, k):
        loss, g = jax.value_and_grad(
            lambda q: diffusion.p_losses(q, sched, data, k, train=True)
        )(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    data = {
        "HR": jnp.zeros((args.batch, 512, 512, 3), jnp.float32),
        "SR": jnp.zeros((args.batch, 512, 512, 3), jnp.float32),
    }
    p = jax.tree_util.tree_map(jnp.array, params)
    o = tx.init(p)
    k = jax.random.PRNGKey(0)
    kind = "xla" if args.xla else "flash"
    result = {"batch": args.batch, "backend": jax.default_backend()}
    try:
        t0 = time.time()
        p, o, loss = jstep(p, o, data, k)
        jax.block_until_ready(loss)
        print(f"# [{kind}] first train step (incl compile): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        p, o, loss = jstep(p, o, data, k)
        jax.block_until_ready(loss)
        t0 = time.time()
        for _ in range(args.iters):
            p, o, loss = jstep(p, o, data, k)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / args.iters
        assert bool(jnp.isfinite(loss))
        result[f"attn128_{kind}_train_ms"] = round(dt * 1e3, 1)
    except AssertionError:  # non-finite loss is a bug, not a bench cell
        raise
    except Exception as e:  # OOM IS the result in the materialized regime
        result[f"attn128_{kind}_error"] = str(e)[:300]
        print(f"# [{kind}] failed: {str(e)[:200]}", file=sys.stderr)
    line = json.dumps(result)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
