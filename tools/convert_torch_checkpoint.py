"""Convert a reference .pth checkpoint (published SR3 weights) into an orbax
checkpoint loadable via config `path.resume_state`.

The reference saves `I{iter}_E{epoch}_gen.pth` as a bare UNet state_dict
(model/model.py:124-144, possibly nested under `denoise_fn.` and with
DataParallel `module.` prefixes) plus `..._opt.pth` with optimizer state.
Only the generator weights transfer — the optimizer state is torch-Adam
specific and is not convertible; resuming training from converted weights
restarts the optimizer (same as the reference's own "pretrained model" path
in val phase).

Usage:
  python tools/convert_torch_checkpoint.py \
      --pth /path/to/I640000_E37_gen.pth \
      --config configs/sr_sr3_16_128.json \
      --out experiments/pretrained/I640000_E37
Then set "resume_state": "experiments/pretrained/I640000_E37".
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="path to *_gen.pth")
    ap.add_argument("--config", required=True, help="framework JSON config")
    ap.add_argument("--out", required=True,
                    help="output prefix (written as {out}_gen)")
    args = ap.parse_args()

    import numpy as np
    import torch

    from sr3_tpu.utils.config import load_json_with_comments
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    opt = load_json_with_comments(args.config)
    unet_opt = opt["model"]["unet"]
    diff_opt = opt["model"]["diffusion"]

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    params = torch_state_dict_to_flax(
        sd,
        in_channel=unet_opt["in_channel"],
        inner_channel=unet_opt["inner_channel"],
        channel_mults=tuple(unet_opt["channel_multiplier"]),
        attn_res=tuple(unet_opt["attn_res"] or ()),
        res_blocks=unet_opt["res_blocks"],
        image_size=diff_opt["image_size"],
        cond_mode=opt["model"]["which_model_G"],
    )
    n = sum(np.asarray(x).size for x in _leaves(params))
    print(f"converted {n:,d} parameters")

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.out + "_gen")
    ocp.PyTreeCheckpointer().save(out, {"params": params}, force=True)
    print(f"wrote {out}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
