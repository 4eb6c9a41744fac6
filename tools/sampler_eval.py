"""Compare reverse-chain samplers on a trained checkpoint.

Evaluates PSNR + SSIM (and wall-clock NFE cost) of the configured samplers
on the config's val set — the measurement behind the README's sampler table
and the round-5 converged-model requal (VERDICT r04 item 7).

  python tools/sampler_eval.py --config configs/_traj100k.json \
      --resume experiments/traj100k_<ts>/checkpoint/I100000_E100001 \
      --timesteps 2000 --samplers ddpm:2000 ddim:50 dpm++:50 \
      --eta 1 --reps 8

Each --samplers entry is `<name>:<steps>` (`ddpm` ignores steps — the
ancestral chain always runs the full schedule; pass the schedule length for
honest NFE accounting). `--eta` applies to ddim and dpm++ (1 = stochastic).
`--reps N` runs N independent noise chains per image per sampler; because
every sampler gets a fresh Trainer built from the same `seed`, the k-th
chain of image i consumes the IDENTICAL PRNG key across samplers — rep-wise
deltas vs the first (baseline) sampler are paired comparisons. Runs on
whatever backend the environment provides (SR3_PLATFORM=cpu for
hardware-free runs).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    ap.add_argument("--reps", type=int, default=1,
                    help="independent noise chains per image per sampler "
                         "(keys are paired across samplers, see docstring)")
    ap.add_argument("--out", default=None, help="optional JSON artifact path")
    args = ap.parse_args()

    from sr3_tpu.data.loader import create_dataloader, create_dataset
    from sr3_tpu.parallel.mesh import create_mesh
    from sr3_tpu.training.trainer import Trainer
    from sr3_tpu.utils.config import (dict_to_nonedict,
                                      load_json_with_comments)
    from sr3_tpu.utils.metrics import (calculate_psnr, calculate_ssim,
                                       tensor2img)

    opt = dict_to_nonedict(load_json_with_comments(args.config))
    opt["phase"] = "val"
    opt["path"]["resume_state"] = args.resume
    sched_opt = dict(opt["model"]["beta_schedule"]["val"])
    if args.timesteps:
        sched_opt["n_timestep"] = args.timesteps

    val_set = create_dataset(opt["datasets"]["val"], "val")
    val_loader = create_dataloader(val_set, opt["datasets"]["val"], "val")
    items = list(val_loader)

    import copy

    results = []
    for spec in args.samplers:
        name, _, steps = spec.partition(":")
        if name != "ddpm" and not steps:
            # without an explicit count the previous sampler's steps would
            # leak through the shared opt and nfe would be recorded as 0
            ap.error(f"sampler spec '{spec}' needs an explicit :steps")
        steps = int(steps or 0)
        sopt = copy.deepcopy(opt)  # no state leaks between samplers
        sopt["model"]["diffusion"]["sampler"] = name
        if name != "ddpm":
            sopt["model"]["diffusion"]["sampler_steps"] = steps
        sopt["model"]["diffusion"]["eta"] = args.eta
        t = Trainer(sopt, mesh=create_mesh(num_data=1))
        t.set_new_noise_schedule(sched_opt, "val")
        # reps-major, image-minor: the PRNG split order (one split per
        # test() call) must be identical across samplers for key pairing
        psnrs = [[] for _ in items]  # [image][rep]
        ssims = [[] for _ in items]
        secs = 0.0
        for _rep in range(args.reps):
            for i, data in enumerate(items):
                t.feed_data(data)
                t0 = time.time()
                t.test(continous=False)
                secs += time.time() - t0
                vis = t.get_current_visuals()
                sr, hr = tensor2img(vis["SR"]), tensor2img(vis["HR"])
                psnrs[i].append(calculate_psnr(sr, hr))
                ssims[i].append(calculate_ssim(sr, hr))
        nfe = steps if name != "ddpm" else sched_opt["n_timestep"]
        flat_p = [p for per_img in psnrs for p in per_img]
        flat_s = [s for per_img in ssims for s in per_img]
        n = len(flat_p)
        row = {
            "sampler": spec,
            "eta": args.eta,
            "nfe": nfe,
            "reps": args.reps,
            "psnr_db": [[round(p, 2) for p in per_img] for per_img in psnrs],
            "ssim": [[round(s, 4) for s in per_img] for per_img in ssims],
            "avg_psnr_db": round(float(np.mean(flat_p)), 3),
            "se_psnr_db": round(float(np.std(flat_p) / np.sqrt(n)), 3),
            "avg_ssim": round(float(np.mean(flat_s)), 4),
            "se_ssim": round(float(np.std(flat_s) / np.sqrt(n)), 4),
            "sample_seconds_total": round(secs, 1),
        }
        if results:  # paired per-chain deltas vs the FIRST sampler listed
            base = results[0]
            dp = np.asarray(row["psnr_db"]) - np.asarray(base["psnr_db"])
            ds = np.asarray(row["ssim"]) - np.asarray(base["ssim"])
            row["d_psnr_vs_first"] = round(float(dp.mean()), 3)
            row["d_psnr_se"] = round(float(dp.std() / np.sqrt(dp.size)), 3)
            row["d_ssim_vs_first"] = round(float(ds.mean()), 4)
            row["d_ssim_se"] = round(float(ds.std() / np.sqrt(ds.size)), 4)
            # chains of one image share that image, so the flat SE above
            # overstates the effective n; the cluster-robust SE collapses
            # each image to its mean delta first (ddof=1 across images)
            if dp.ndim == 2 and dp.shape[0] > 1:
                pi, si = dp.mean(axis=1), ds.mean(axis=1)
                n_img = dp.shape[0]
                row["d_psnr_se_cluster"] = round(
                    float(pi.std(ddof=1) / np.sqrt(n_img)), 3)
                row["d_ssim_se_cluster"] = round(
                    float(si.std(ddof=1) / np.sqrt(n_img)), 4)
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
