"""Probe: does bf16 compute in the reverse chain cost val PSNR?

Loads the head-to-head checkpoint (tools/quality_headtohead.py --extend)
and validates the SAME params on the SAME 3 fixture images at the SAME
T=200 val schedule, once with model.dtype=bfloat16 (the TPU default) and
once with model.dtype=float32. Any PSNR/SSIM delta isolates the compute
dtype's contribution to the head-to-head gap vs the f32 torch reference.

Usage: python tools/val_dtype_probe.py [--ckpt PREFIX]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from tools.quality_headtohead import PROTO, load_fixtures, score  # noqa: E402


def validate(dtype_name, ckpt_prefix):
    from sr3_tpu.utils.config import dict_to_nonedict
    from sr3_tpu.training.trainer import create_model

    p = PROTO
    u = p["unet"]
    opt = dict_to_nonedict({
        "name": "dtype_probe", "phase": "val", "gpu_ids": [0],
        "seed": p["model_seed"],
        "path": {"checkpoint": os.path.join(REPO, "experiments",
                                            "dtype_probe", "checkpoint"),
                 "resume_state": ckpt_prefix},
        "model": {
            "which_model_G": "sr3", "finetune_norm": False,
            "dtype": dtype_name,
            "unet": {
                "in_channel": u["in_channel"],
                "out_channel": u["out_channel"],
                "inner_channel": u["inner_channel"],
                "norm_groups": u["norm_groups"],
                "channel_multiplier": list(u["channel_mults"]),
                "attn_res": list(u["attn_res"]),
                "res_blocks": u["res_blocks"], "dropout": u["dropout"],
            },
            "beta_schedule": {"val": dict(p["val_schedule"])},
            "diffusion": {"image_size": p["image_size"], "channels": 3,
                          "conditional": True},
        },
    })
    trainer = create_model(opt)
    trainer.load_network()
    trainer.set_new_noise_schedule(p["val_schedule"], "val")
    hr, sr = load_fixtures()
    psnrs, ssims = [], []
    for vid in p["val_ids"]:
        trainer.feed_data({"SR": sr[vid][None], "HR": hr[vid][None]})
        trainer.test(continous=False)
        vis = trainer.get_current_visuals(need_LR=False)
        ps, ss = score(vis["SR"][0], hr[vid])
        psnrs.append(round(ps, 4))
        ssims.append(round(ss, 4))
        print(f"  [{dtype_name}] img {vid}: psnr {ps:.3f} ssim {ss:.4f}",
              flush=True)
    return dict(dtype=dtype_name, psnr=psnrs, ssim=ssims,
                avg_psnr=round(float(np.mean(psnrs)), 4),
                avg_ssim=round(float(np.mean(ssims)), 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        REPO, "experiments", "headtohead_r04", "checkpoint", "I21600_E1"))
    args = ap.parse_args()

    from sr3_tpu.utils.runtime import setup_runtime

    setup_runtime()

    out = {"what": __doc__.split("\n")[0], "ckpt": args.ckpt, "runs": []}
    for dt in ("bfloat16", "float32"):
        out["runs"].append(validate(dt, args.ckpt))
    a, b = out["runs"]
    out["d_psnr_f32_minus_bf16"] = round(b["avg_psnr"] - a["avg_psnr"], 4)
    out["d_ssim_f32_minus_bf16"] = round(b["avg_ssim"] - a["avg_ssim"], 4)
    path = os.path.join(REPO, "docs", "DTYPE_PROBE_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
