"""Re-validate the 'matched quality' sampler claim at T=2000 with SSIM
(VERDICT r03 item #2).

Round 3 labeled the 50-NFE SDE-DPM++(2M) bench line `matched_quality_
throughput` on evidence from a T=200 / 2-image / PSNR-only overfit eval.
This re-measures on the head-to-head model (tools/quality_headtohead.py
--extend checkpoint): the FULL T=2000 ancestral chain vs DDIM and
DPM-Solver++(2M) at several NFE, PSNR + SSIM on the 3 val fixture images,
identical per-image noise keys across samplers.

CORRECTION (round 4, second pass): the first sweep's dpm++ configs never
set ``eta``, and the trainer's sampler plumbing defaults eta to 0.0 — so
the runs it labeled ``dpm++_sde_*`` actually measured the ODE variant,
while bench.py ships eta=1.0 (the true SDE). Every config below now sets
eta EXPLICITLY and the run names carry it.

Usage: python tools/sampler_requal.py [--ckpt PREFIX] [--seeds N]
Writes docs/SAMPLER_REQUAL_r04.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from tools.quality_headtohead import PROTO, load_fixtures, score  # noqa: E402

T2000 = dict(schedule="linear", n_timestep=2000,
             linear_start=1e-6, linear_end=1e-2)


def build_trainer(ckpt_prefix, sampler_cfg, val_schedule=None):
    from sr3_tpu.utils.config import dict_to_nonedict
    from sr3_tpu.training.trainer import create_model

    p = PROTO
    u = p["unet"]
    sched = dict(val_schedule or T2000)
    diffusion = {"image_size": p["image_size"], "channels": 3,
                 "conditional": True}
    diffusion.update(sampler_cfg)
    opt = dict_to_nonedict({
        "name": "sampler_requal", "phase": "val", "gpu_ids": [0],
        "seed": p["model_seed"],
        "path": {"checkpoint": os.path.join(REPO, "experiments",
                                            "sampler_requal", "checkpoint"),
                 "resume_state": ckpt_prefix},
        "model": {
            "which_model_G": "sr3", "finetune_norm": False,
            "unet": {
                "in_channel": u["in_channel"],
                "out_channel": u["out_channel"],
                "inner_channel": u["inner_channel"],
                "norm_groups": u["norm_groups"],
                "channel_multiplier": list(u["channel_mults"]),
                "attn_res": list(u["attn_res"]),
                "res_blocks": u["res_blocks"], "dropout": u["dropout"],
            },
            "beta_schedule": {"val": sched},
            "diffusion": diffusion,
        },
    })
    t = create_model(opt)
    t.set_new_noise_schedule(sched, "val")
    return t


def run_one(name, sampler_cfg, ckpt, hr, sr, keys, n_seeds,
            val_schedule=None):
    """All (val image x noise seed) chains in ONE batched dispatch — a
    batch-1 128^2 chain leaves the chip idle, so n_seeds of evidence cost
    the same wall time as one."""
    t = build_trainer(ckpt, sampler_cfg, val_schedule)
    vids = list(PROTO["val_ids"])
    xs = np.stack([sr[v] for v in vids for _ in range(n_seeds)])
    t0 = time.time()
    out = t.test_batched(xs, keys, continous=False)
    wall = time.time() - t0
    ps = np.array([[score(out[i * n_seeds + s], hr[v])[0]
                    for s in range(n_seeds)] for i, v in enumerate(vids)])
    ss = np.array([[score(out[i * n_seeds + s], hr[v])[1]
                    for s in range(n_seeds)] for i, v in enumerate(vids)])
    rec = dict(sampler=name, cfg=sampler_cfg, n_seeds=n_seeds,
               psnr_per_image_mean=[round(x, 4) for x in ps.mean(1)],
               ssim_per_image_mean=[round(x, 4) for x in ss.mean(1)],
               avg_psnr=round(float(ps.mean()), 4),
               std_psnr=round(float(ps.std()), 4),
               avg_ssim=round(float(ss.mean()), 4),
               std_ssim=round(float(ss.std()), 4),
               wall_s=round(wall, 1))
    print(json.dumps(rec), flush=True)
    del t
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        REPO, "experiments", "headtohead_r04", "checkpoint", "I21600_E1"))
    ap.add_argument("--seeds", type=int, default=4,
                    help="independent noise chains per val image")
    ap.add_argument("--val-t", type=int, default=2000,
                    help="n_timestep of the val schedule (the ancestral "
                         "gold chain runs this many steps)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "SAMPLER_REQUAL_r04.json"),
        help="output artifact path (override for non-default ckpt/"
             "schedule sweeps so the canonical artifact is not clobbered)")
    args = ap.parse_args()
    val_sched = dict(T2000, n_timestep=args.val_t)

    from sr3_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax

    hr, sr = load_fixtures()
    # one fixed key per (val image, seed) chain, shared by every sampler
    n = len(PROTO["val_ids"]) * args.seeds
    base = jax.random.PRNGKey(42)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(np.arange(n))

    runs = []
    for name, cfg in [
        (f"ancestral_T{args.val_t}", {}),
        # eta set EXPLICITLY everywhere (see module docstring): eta=1 is
        # the SDE variant bench.py ships, eta=0 the deterministic ODE.
        ("dpm++_sde1_100", {"sampler": "dpm++", "sampler_steps": 100,
                            "eta": 1.0}),
        ("dpm++_sde1_50", {"sampler": "dpm++", "sampler_steps": 50,
                           "eta": 1.0}),
        ("dpm++_ode_50", {"sampler": "dpm++", "sampler_steps": 50,
                          "eta": 0.0}),
        ("ddim_eta1_100", {"sampler": "ddim", "sampler_steps": 100,
                           "eta": 1.0}),
        ("ddim_eta1_50", {"sampler": "ddim", "sampler_steps": 50,
                          "eta": 1.0}),
        ("ddim_eta0_50", {"sampler": "ddim", "sampler_steps": 50,
                          "eta": 0.0}),
    ]:
        runs.append(run_one(name, cfg, args.ckpt, hr, sr, keys, args.seeds,
                            val_sched))

    anc = runs[0]
    out = dict(
        what=(f"T={args.val_t} sampler quality re-validation "
              "(VERDICT r03 #2): PSNR+SSIM vs the full ancestral "
              "chain, same per-image noise keys, 3 val fixtures. Second "
              "pass: eta explicit in every config (the first sweep's "
              "'dpm++_sde_*' runs defaulted to eta=0, i.e. measured the "
              "ODE variant, not the SDE that bench.py ships)."),
        ckpt=args.ckpt, schedule=val_sched, runs=runs,
        deltas={r["sampler"]: {
            "d_psnr": round(r["avg_psnr"] - anc["avg_psnr"], 4),
            "d_ssim": round(r["avg_ssim"] - anc["avg_ssim"], 4)}
            for r in runs[1:]},
    )
    path = args.out
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
