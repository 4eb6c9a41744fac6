"""One-command published-weights validation (VERDICT r04 item 8).

Given a reference `*_gen.pth` checkpoint (e.g. the published SR3 16->128
weights, /root/reference/README.md:60-91) and a framework config, this runs
the complete acceptance pipeline in a single invocation:

  1. convert      — torch state_dict -> flax params (utils/torch_compat),
                    with param-count report; handles bare-UNet dicts,
                    `module.` (DataParallel) and `denoise_fn.` (wrapped
                    GaussianDiffusion, reference model/model.py:124-144)
                    prefixes, and ignores the reference's registered
                    schedule buffers (sr3_modules/diffusion.py:110-139).
  2. parity       — loads the SAME state_dict into the reference torch UNet
                    (imported from /root/reference when present) and compares
                    denoiser outputs on a shared random input: max|delta| and
                    relative error. Skipped cleanly when the reference repo
                    or torch is unavailable (--no-parity to force-skip).
  3. sample       — full val-phase diffusion chain (2000 steps for the
                    published config; --timesteps to override) on a val
                    directory pair (sr_{l}_{r} + hr_{r} PNGs, the layout
                    data/prepare.py emits), batched on the default backend.
  4. score        — per-image + mean PSNR/SSIM vs HR (reference
                    core/metrics.py conventions) and a JSON report.

Usage (the moment the published checkpoint is reachable):
  python tools/validate_pth.py /path/to/I640000_E37_gen.pth \
      --config configs/sr_sr3_16_128.json \
      --data dataset/celebahq_16_128 [--timesteps 2000] [--limit 8] \
      [--out docs/VALIDATE_I640000.json] [--save-orbax experiments/pub/I640000]

In-environment rehearsal (exercised by tests/test_validate_pth.py): export a
framework checkpoint to .pth via tools/export_torch_checkpoint.py, then feed
it back through this tool.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = os.environ.get("SR3_REFERENCE_ROOT", "/root/reference")


def load_state_dict(pth):
    import torch

    sd = torch.load(pth, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and not any(
            hasattr(v, "numpy") for v in sd.values()):
        sd = sd["state_dict"]
    return {k: v for k, v in sd.items()}


def unet_kwargs(opt):
    u = opt["model"]["unet"]
    return dict(
        in_channel=u["in_channel"],
        inner_channel=u["inner_channel"],
        channel_mults=tuple(u["channel_multiplier"]),
        attn_res=tuple(u["attn_res"] or ()),
        res_blocks=u["res_blocks"],
        image_size=opt["model"]["diffusion"]["image_size"],
        cond_mode=opt["model"]["which_model_G"],
    )


def convert(sd, opt):
    from sr3_tpu.utils.torch_compat import torch_state_dict_to_flax

    params = torch_state_dict_to_flax(sd, **unet_kwargs(opt))
    import jax

    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return params, n


def forward_parity(sd, params, opt, seed=0):
    """Load ``sd`` into the reference torch UNet (strict) and compare the
    denoiser forward against the converted flax params on one shared input.
    Returns a dict or None when the reference/torch is unavailable."""
    if not os.path.isdir(REF):
        return None
    try:
        import torch
    except ImportError:  # pragma: no cover
        return None

    which = opt["model"]["which_model_G"]
    sys.path.insert(0, os.path.join(REF, "model", f"{which}_modules"))
    try:
        import importlib

        import unet as ref_unet

        importlib.reload(ref_unet)
    finally:
        sys.path.pop(0)

    u = opt["model"]["unet"]
    size = opt["model"]["diffusion"]["image_size"]
    common = dict(
        in_channel=u["in_channel"], out_channel=u["out_channel"],
        inner_channel=u["inner_channel"], norm_groups=u["norm_groups"],
        channel_mults=tuple(u["channel_multiplier"]),
        attn_res=tuple(u["attn_res"] or ()), res_blocks=u["res_blocks"],
        dropout=0, image_size=size,
    )
    if which == "sr3":
        net = ref_unet.UNet(with_noise_level_emb=True, **common)
    else:
        net = ref_unet.UNet(with_time_emb=True, **common)

    bare = {}
    for k, v in sd.items():
        for prefix in ("module.", "denoise_fn."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        bare[k] = v
    own = set(net.state_dict().keys())
    net.load_state_dict({k: v for k, v in bare.items() if k in own},
                        strict=True)
    net.eval()

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, size, size, u["in_channel"]), np.float32)
    cond = (np.asarray([0.3, 0.8], np.float32) if which == "sr3"
            else np.asarray([3.0, 7.0], np.float32))

    with torch.no_grad():
        x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        c_t = (torch.from_numpy(cond.reshape(-1, 1)) if which == "sr3"
               else torch.from_numpy(cond))
        out_ref = np.transpose(net(x_t, c_t).numpy(), (0, 2, 3, 1))

    from sr3_tpu.models.unet import UNet

    ours = UNet(
        cond_mode=which, in_channel=u["in_channel"],
        out_channel=u["out_channel"], inner_channel=u["inner_channel"],
        norm_groups=u["norm_groups"],
        channel_mults=tuple(u["channel_multiplier"]),
        attn_res=tuple(u["attn_res"] or ()), res_blocks=u["res_blocks"],
        dropout=0, image_size=size,
    )
    out_ours = np.asarray(ours.apply(params, x, cond, train=False))

    scale = float(np.abs(out_ref).max()) or 1.0
    return {
        "max_abs_diff": float(np.abs(out_ref - out_ours).max()),
        "rel_err": float(np.abs(out_ref - out_ours).max() / scale),
        "out_scale": scale,
    }


def find_pairs(data_root, l_res, r_res, limit=None):
    sr_dir = os.path.join(data_root, f"sr_{l_res}_{r_res}")
    hr_dir = os.path.join(data_root, f"hr_{r_res}")
    if not os.path.isdir(sr_dir):
        raise SystemExit(f"no {sr_dir}: expected data/prepare.py layout "
                         f"(sr_{l_res}_{r_res}/ + hr_{r_res}/)")
    srs = sorted(glob.glob(os.path.join(sr_dir, "*.png")))
    if limit:
        srs = srs[:limit]
    pairs = []
    for s in srs:
        h = os.path.join(hr_dir, os.path.basename(s))
        pairs.append((s, h if os.path.isfile(h) else None))
    return pairs


def run_chain(opt, params, pairs, timesteps, batch, seed):
    import jax
    import jax.numpy as jnp

    from sr3_tpu.models.networks import define_G
    from sr3_tpu.models.schedule import make_schedule
    from sr3_tpu.utils import metrics

    diffusion = define_G(opt)
    sched_opt = dict(opt["model"]["beta_schedule"]["val"])
    if timesteps:
        sched_opt["n_timestep"] = timesteps
    sched = make_schedule(sched_opt)

    fn = jax.jit(
        lambda p, x, k: diffusion.super_resolution(p, sched, x, k, False)
    )
    key = jax.random.PRNGKey(seed)
    rows, wall = [], 0.0
    for i in range(0, len(pairs), batch):
        chunk = pairs[i:i + batch]
        sr = np.stack([
            metrics.load_img(s).astype(np.float32) / 127.5 - 1.0
            for s, _ in chunk
        ])
        # static batch shape: pad the tail chunk so jit compiles once
        pad = batch - len(chunk)
        if pad:
            sr = np.concatenate([sr, np.zeros_like(sr[:pad])])
        key, sub = jax.random.split(key)
        t0 = time.time()
        out = np.asarray(jax.block_until_ready(fn(params, jnp.asarray(sr), sub)))
        wall += time.time() - t0
        for j, (s, h) in enumerate(chunk):
            img = metrics.tensor2img(out[j])
            row = {"sr": os.path.basename(s)}
            if h:
                hr = metrics.load_img(h)
                row["psnr"] = round(metrics.calculate_psnr(img, hr), 4)
                row["ssim"] = round(metrics.calculate_ssim(img, hr), 4)
            rows.append((row, img))
    return rows, wall, sched_opt["n_timestep"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pth", help="path to *_gen.pth")
    ap.add_argument("--config", required=True)
    ap.add_argument("--data", default=None,
                    help="val root with sr_{l}_{r}/ + hr_{r}/ "
                         "(default: the config's val dataroot)")
    ap.add_argument("--timesteps", type=int, default=None,
                    help="override val n_timestep (published point: 2000)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-parity", action="store_true")
    ap.add_argument("--out", default=None, help="JSON report path")
    ap.add_argument("--save-images", default=None,
                    help="directory for the sampled SR PNGs")
    ap.add_argument("--save-orbax", default=None,
                    help="also persist the converted params as "
                         "{prefix}_gen for path.resume_state")
    args = ap.parse_args(argv)

    from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

    opt = dict_to_nonedict(load_json_with_comments(args.config))
    opt["phase"] = "val"

    report = {"pth": os.path.abspath(args.pth), "config": args.config}

    sd = load_state_dict(args.pth)
    params, n = convert(sd, opt)
    report["n_params"] = n
    print(f"[1/4] converted {n:,d} parameters", file=sys.stderr)

    if args.no_parity:
        report["parity"] = "skipped (--no-parity)"
    else:
        par = forward_parity(sd, params, opt, args.seed)
        report["parity"] = par if par else "skipped (no reference/torch)"
        if par:
            print(f"[2/4] forward parity: max|d|={par['max_abs_diff']:.3e} "
                  f"rel={par['rel_err']:.3e}", file=sys.stderr)

    data_root = args.data
    if data_root is None:
        for d in opt["datasets"].values():
            if d.get("phase", "") == "val" or "val" in str(d.get("name", "")):
                data_root = d["dataroot"]
        data_root = data_root or list(opt["datasets"].values())[-1]["dataroot"]
    val = [d for k, d in opt["datasets"].items() if k == "val"]
    l_res = val[0]["l_resolution"] if val else 16
    r_res = val[0]["r_resolution"] if val else 128
    pairs = find_pairs(data_root, l_res, r_res, args.limit)
    print(f"[3/4] sampling {len(pairs)} images from {data_root} "
          f"(batch {args.batch})", file=sys.stderr)

    rows, wall, T = run_chain(opt, params, pairs, args.timesteps,
                              min(args.batch, max(len(pairs), 1)), args.seed)
    if args.save_images:
        from sr3_tpu.utils.metrics import save_img

        os.makedirs(args.save_images, exist_ok=True)
        for row, img in rows:
            save_img(img, os.path.join(args.save_images,
                                       row["sr"].replace(".png", "_sr.png")))
    scored = [r for r, _ in rows if "psnr" in r]
    report["timesteps"] = T
    report["n_images"] = len(rows)
    report["wall_s"] = round(wall, 1)
    report["per_image"] = [r for r, _ in rows]
    if scored:
        report["avg_psnr"] = round(float(np.mean([r["psnr"] for r in scored])), 4)
        report["avg_ssim"] = round(float(np.mean([r["ssim"] for r in scored])), 4)
        print(f"[4/4] PSNR {report['avg_psnr']:.2f}  "
              f"SSIM {report['avg_ssim']:.4f}  ({wall:.0f}s)", file=sys.stderr)
        print("      published 16->128 @2000: PSNR 23.26 / SSIM 0.675 "
              "(reference README.md:45-52)", file=sys.stderr)

    if args.save_orbax:
        import jax
        import orbax.checkpoint as ocp

        path = os.path.abspath(args.save_orbax) + "_gen"
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, jax.tree_util.tree_map(np.asarray, params))
        ckpt.wait_until_finished()
        report["orbax"] = path
        print(f"saved orbax params -> {path}", file=sys.stderr)

    out = json.dumps(report, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
        print(f"report -> {args.out}", file=sys.stderr)
    else:
        print(out)
    return report


if __name__ == "__main__":
    main()
