"""Benchmark the Adam-traffic lever: train.optimizer.mu_dtype=bfloat16
(VERDICT r03 item #7).

The round-3 train roofline (docs/TRAINSCAN_r03.txt) pinned step time to
HBM traffic dominated by f32 master params + f32 Adam moments. mu_dtype=
bfloat16 halves the first-moment bytes. Two measurements:

1. SPEED on the flagship arch (97.8M, 16->128, batch 16): ms/step + img/s
   for mu f32 vs bf16 via the Trainer's own jitted step.
2. QUALITY on the head-to-head protocol model: identical fixture data
   stream / seeds, train both settings, compare the loss trajectory and a
   final T=200 val PSNR/SSIM — the evidence for flipping the flagship
   default.

Usage: python tools/mu_dtype_bench.py [--speed-iters 30] [--steps 1500]
Writes docs/MU_DTYPE_r04.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from tools.quality_headtohead import (PROTO, batch_stream, load_fixtures,
                                      make_batch, score)  # noqa: E402


def _opt_dict(unet, image_size, mu_dtype, steps, name):
    from sr3_tpu.utils.config import dict_to_nonedict

    return dict_to_nonedict({
        "name": name, "phase": "train", "gpu_ids": [0],
        "seed": PROTO["model_seed"],
        "path": {"checkpoint": os.path.join(REPO, "experiments", name,
                                            "checkpoint"),
                 "resume_state": None},
        "model": {
            "which_model_G": "sr3", "finetune_norm": False,
            "unet": unet,
            "beta_schedule": {"train": dict(PROTO["train_schedule"]),
                              "val": dict(PROTO["val_schedule"])},
            "diffusion": {"image_size": image_size, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": steps,
                  "optimizer": {"type": "adam", "lr": PROTO["lr"],
                                "mu_dtype": mu_dtype}},
    })


FLAGSHIP_UNET = {
    # configs/sr_sr3_16_128.json arch (97.8M params)
    "in_channel": 6, "out_channel": 3, "inner_channel": 64,
    "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
    "attn_res": [16], "res_blocks": 2, "dropout": 0.2,
}


def bench_speed(mu_dtype, batch=16, iters=30):
    import jax

    from sr3_tpu.training.trainer import create_model

    t = create_model(_opt_dict(FLAGSHIP_UNET, 128, mu_dtype, 10 ** 6,
                               f"mu_speed_{mu_dtype or 'f32'}"))
    t.set_new_noise_schedule(PROTO["train_schedule"], "train")
    rng = np.random.default_rng(0)
    hr = rng.standard_normal((batch, 128, 128, 3)).astype(np.float32) * 0.5
    sr = rng.standard_normal((batch, 128, 128, 3)).astype(np.float32) * 0.5
    t.feed_data({"HR": hr, "SR": sr})
    t.optimize_parameters()  # compile + warm

    def sync():
        # force a REAL device->host readback: on the axon tunnel,
        # block_until_ready on donated-state chains can return before the
        # work completes (verify-skill timing gotcha), inflating img/s ~3x
        leaf = jax.tree_util.tree_leaves(t.state.params)[0]
        return float(np.asarray(jax.device_get(leaf)).ravel()[0])

    sync()
    t0 = time.time()
    for _ in range(iters):
        t.optimize_parameters()
    sync()
    dt = (time.time() - t0) / iters
    rec = dict(mu_dtype=mu_dtype or "float32", ms_per_step=round(dt * 1e3, 2),
               img_per_s=round(batch / dt, 1), batch=batch)
    print(json.dumps(rec), flush=True)
    del t
    return rec


def train_quality(mu_dtype, steps, val_reps=1):
    import jax

    from sr3_tpu.training.trainer import create_model

    p = PROTO
    u = dict(p["unet"])
    u["channel_multiplier"] = list(u.pop("channel_mults"))
    u["attn_res"] = list(u["attn_res"])
    t = create_model(_opt_dict(u, p["image_size"], mu_dtype, steps,
                               f"mu_q_{mu_dtype or 'f32'}"))
    t.set_new_noise_schedule(p["train_schedule"], "train")
    hr, sr = load_fixtures()
    stream = batch_stream(len(hr), steps, p["batch"], p["data_seed"])
    losses = []
    for step, (idx, flips) in enumerate(stream, start=1):
        h, s = make_batch(hr, sr, idx, flips)
        t.feed_data({"HR": h, "SR": s})
        t.optimize_parameters()
        if step % 50 == 0:
            losses.append(round(float(t.log_dict["l_pix"]), 4))
    t.set_new_noise_schedule(p["val_schedule"], "val")
    # val_reps independent chains per image: the single-chain sigma is
    # ~0.6-1.2 dB depending on model/schedule (docs/SAMPLER_REQUAL_r04
    # .json std_psnr), which swamps sub-dB deltas
    psnrs, ssims = [], []          # per-image means
    chain_psnrs, chain_ssims = [], []  # every chain, flattened
    for vid in p["val_ids"]:
        ips, iss = [], []
        for _ in range(val_reps):
            t.feed_data({"SR": sr[vid][None], "HR": hr[vid][None]})
            t.test(continous=False)
            vis = t.get_current_visuals(need_LR=False)
            ps, ss = score(vis["SR"][0], hr[vid])
            ips.append(ps)
            iss.append(ss)
        chain_psnrs += ips
        chain_ssims += iss
        psnrs.append(round(float(np.mean(ips)), 4))
        ssims.append(round(float(np.mean(iss)), 4))
    rec = dict(mu_dtype=mu_dtype or "float32", loss_per50=losses,
               final_loss_mean_last5=round(float(np.mean(losses[-5:])), 4),
               val_reps=val_reps,
               val_psnr=psnrs, val_ssim=ssims,
               avg_psnr=round(float(np.mean(psnrs)), 4),
               avg_ssim=round(float(np.mean(ssims)), 4),
               chain_psnr_std=round(float(np.std(chain_psnrs)), 4),
               sem_psnr=round(float(np.std(chain_psnrs)
                                    / max(len(chain_psnrs), 1) ** 0.5), 4))
    print(json.dumps({k: v for k, v in rec.items() if k != "loss_per50"}),
          flush=True)
    del t
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed-iters", type=int, default=30)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--val-reps", type=int, default=1,
                    help="independent val chains per image (single-chain "
                         "sigma ~0.6 dB; 5 reps x 3 images -> SEM ~0.16 dB)")
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--skip-speed", action="store_true")
    args = ap.parse_args()

    from sr3_tpu.utils.runtime import setup_runtime

    setup_runtime()

    path = os.path.join(REPO, "docs", "MU_DTYPE_r04.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)

    out = {"what": __doc__.split("\n")[0],
           "speed_flagship_b16": [], "quality_protocol": []}
    if args.skip_speed:
        out["speed_flagship_b16"] = prev.get("speed_flagship_b16", [])
        if "speedup_bf16_mu" in prev:
            out["speedup_bf16_mu"] = prev["speedup_bf16_mu"]
    else:
        for mu in (None, "bfloat16"):
            out["speed_flagship_b16"].append(
                bench_speed(mu, iters=args.speed_iters))
        a, b = out["speed_flagship_b16"]
        out["speedup_bf16_mu"] = round(a["ms_per_step"] / b["ms_per_step"], 4)

    if not args.skip_quality:
        for mu in (None, "bfloat16"):
            out["quality_protocol"].append(
                train_quality(mu, args.steps, val_reps=args.val_reps))
        qa, qb = out["quality_protocol"]
        out["d_psnr_bf16_minus_f32"] = round(
            qb["avg_psnr"] - qa["avg_psnr"], 4)
        out["d_ssim_bf16_minus_f32"] = round(
            qb["avg_ssim"] - qa["avg_ssim"], 4)
    else:
        # speed-only rerun: keep the already-measured quality half
        for k in ("quality_protocol", "d_psnr_bf16_minus_f32",
                  "d_ssim_bf16_minus_f32"):
            if k in prev:
                out[k] = prev[k]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
