"""Throughput benchmark: SR3 16->128 reverse-diffusion sampling on TPU.

Headline metric (BASELINE.md north star): images/sec/chip for the full
2000-step reverse chain at 128x128 with the shipped sr_sr3_16_128 model.
The whole chain is one lax.scan, so per-step host overhead is zero.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference publishes no throughput numbers; a 1080Ti-class GPU
running the same torch model (batch 1, 2000 sequential UNet evals at 128^2,
~10 it/s per the SR3-era community reports) delivers ~0.005 images/sec.

Env knobs: BENCH_BATCH (default 8), BENCH_STEPS (default 2000),
BENCH_REPEATS (default 1), SR3_PLATFORM (force backend).
"""

import json
import os
import sys
import time

import jax

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax.numpy as jnp

BASELINE_1080TI_IMG_PER_SEC = 0.005


def main():
    from sr3_tpu.models.networks import define_G, init_params
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

    batch = int(os.environ.get("BENCH_BATCH", 8))
    steps = int(os.environ.get("BENCH_STEPS", 2000))
    repeats = int(os.environ.get("BENCH_REPEATS", 1))
    config = os.environ.get("BENCH_CONFIG", "configs/sr_sr3_16_128.json")

    opt = dict_to_nonedict(load_json_with_comments(config))
    opt["phase"] = "val"
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    sched = make_schedule(
        {"schedule": "linear", "n_timestep": steps,
         "linear_start": 1e-6, "linear_end": 1e-2}
    )

    res = opt["model"]["diffusion"]["image_size"]
    x_sr = jnp.zeros((batch, res, res, 3), jnp.float32)

    fn = jax.jit(
        lambda p, x, k: diffusion.super_resolution(p, sched, x, k, False)
    )

    t0 = time.time()
    out = fn(params, x_sr, jax.random.PRNGKey(1))
    out.block_until_ready()
    compile_and_first = time.time() - t0
    print(f"# first run (incl. compile): {compile_and_first:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    for i in range(repeats):
        out = fn(params, x_sr, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
    dt = (time.time() - t0) / repeats

    imgs_per_sec = batch / dt
    # normalize to the 2000-step budget if BENCH_STEPS overrode it
    imgs_per_sec_2000 = imgs_per_sec * steps / 2000.0
    print(
        f"# batch={batch} steps={steps} time/batch={dt:.2f}s "
        f"({dt / steps * 1e3:.2f} ms/step) backend={jax.default_backend()}",
        file=sys.stderr,
    )
    stem = os.path.splitext(os.path.basename(config))[0]
    print(json.dumps({
        "metric": f"{stem}_sampling_2000step_throughput",
        "value": round(imgs_per_sec_2000, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_2000 / BASELINE_1080TI_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
