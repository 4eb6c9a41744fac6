"""Export an orbax checkpoint as a reference-loadable `*_gen.pth`.

Inverse of tools/convert_torch_checkpoint.py: weights trained in this
framework become a torch state_dict the reference loads with `strict=True`
as its `path.resume_state` (model/model.py:146-160 loads `{prefix}_gen.pth`;
optimizer state is framework-specific in both directions and not exported).
Includes the schedule buffers the reference registers at
model/sr3_modules/diffusion.py:110-139, computed from the config's `val`
(or `--phase train`) beta schedule.

Usage:
  python tools/export_torch_checkpoint.py \
      --resume experiments/<run>/checkpoint/I100000_E123 \
      --config configs/sr_sr3_16_128.json \
      --out /path/to/I100000_E123_gen.pth [--ema] [--phase val]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True,
                    help="orbax checkpoint prefix (reads {resume}_gen)")
    ap.add_argument("--config", required=True, help="framework JSON config")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA weights instead of the raw params")
    ap.add_argument("--phase", default="val", choices=["train", "val"],
                    help="which beta_schedule section to bake in")
    args = ap.parse_args()

    import orbax.checkpoint as ocp
    import torch

    from sr3_tpu.utils.config import load_json_with_comments
    from sr3_tpu.utils.torch_compat import flax_params_to_torch_state_dict

    opt = load_json_with_comments(args.config)
    unet_opt = opt["model"]["unet"]
    diff_opt = opt["model"]["diffusion"]

    gen = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(args.resume + "_gen")
    )
    which = "ema_params" if args.ema else "params"
    if args.ema and "ema_params" not in gen:
        raise SystemExit("checkpoint has no ema_params (EMA was off)")
    sd = flax_params_to_torch_state_dict(
        gen[which],
        schedule_opt=opt["model"]["beta_schedule"][args.phase],
        in_channel=unet_opt["in_channel"],
        inner_channel=unet_opt["inner_channel"],
        channel_mults=tuple(unet_opt["channel_multiplier"]),
        attn_res=tuple(unet_opt["attn_res"] or ()),
        res_blocks=unet_opt["res_blocks"],
        image_size=diff_opt["image_size"],
        cond_mode=opt["model"]["which_model_G"],
    )
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
    n = sum(v.size for v in sd.values())
    print(f"wrote {args.out}: {len(sd)} keys, {n:,d} values")


if __name__ == "__main__":
    main()
