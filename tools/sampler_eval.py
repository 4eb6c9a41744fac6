"""Compare reverse-chain samplers on a trained checkpoint.

Evaluates PSNR (and wall-clock NFE cost) of the configured samplers on the
config's val set — the measurement behind the README's sampler table.

  python tools/sampler_eval.py --config configs/_traj100k.json \
      --resume experiments/traj100k_<ts>/checkpoint/I100000_E100001 \
      --timesteps 200 --samplers ddpm:200 ddim:50 dpm++:25 dpm++:10

Each --samplers entry is `<name>:<steps>` (`ddpm` ignores steps — the
ancestral chain always runs the full schedule; pass the schedule length for
honest NFE accounting). `--eta` applies to ddim. Runs on whatever backend
the environment provides (SR3_PLATFORM=cpu for hardware-free runs).
"""

import argparse
import json
import sys
import time

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", required=True,
                    help="checkpoint prefix (no _gen/_opt suffix)")
    ap.add_argument("--timesteps", type=int, default=None,
                    help="override val schedule length")
    ap.add_argument("--samplers", nargs="+", default=["ddpm:200", "ddim:50",
                                                      "dpm++:25"])
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--out", default=None, help="optional JSON artifact path")
    args = ap.parse_args()

    from sr3_tpu.data.loader import create_dataloader, create_dataset
    from sr3_tpu.parallel.mesh import create_mesh
    from sr3_tpu.training.trainer import Trainer
    from sr3_tpu.utils.config import (dict_to_nonedict,
                                      load_json_with_comments)
    from sr3_tpu.utils.metrics import calculate_psnr, tensor2img

    opt = dict_to_nonedict(load_json_with_comments(args.config))
    opt["phase"] = "val"
    opt["path"]["resume_state"] = args.resume
    sched_opt = dict(opt["model"]["beta_schedule"]["val"])
    if args.timesteps:
        sched_opt["n_timestep"] = args.timesteps

    val_set = create_dataset(opt["datasets"]["val"], "val")
    val_loader = create_dataloader(val_set, opt["datasets"]["val"], "val")
    items = list(val_loader)

    results = []
    for spec in args.samplers:
        name, _, steps = spec.partition(":")
        steps = int(steps or 0)
        opt["model"]["diffusion"]["sampler"] = name
        if steps and name != "ddpm":
            opt["model"]["diffusion"]["sampler_steps"] = steps
        opt["model"]["diffusion"]["eta"] = args.eta
        t = Trainer(opt, mesh=create_mesh(num_data=1))
        t.set_new_noise_schedule(sched_opt, "val")
        psnrs, secs = [], 0.0
        for data in items:
            t.feed_data(data)
            t0 = time.time()
            t.test(continous=False)
            secs += time.time() - t0
            vis = t.get_current_visuals()
            psnrs.append(calculate_psnr(
                tensor2img(vis["SR"]), tensor2img(vis["HR"])
            ))
        nfe = steps if name != "ddpm" else sched_opt["n_timestep"]
        row = {
            "sampler": spec,
            "nfe": nfe,
            "psnr_db": [round(p, 2) for p in psnrs],
            "avg_psnr_db": round(float(np.mean(psnrs)), 2),
            "sample_seconds_total": round(secs, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "config": args.config, "resume": args.resume,
                "val_timesteps": sched_opt["n_timestep"],
                "results": results,
            }, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
