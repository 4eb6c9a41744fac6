"""Chained multi-stage generation (the SR3 paper's cascade pipeline).

The SR3 paper's headline 1024x1024 faces come from a CASCADE of models
(unconditional 64^2 -> 64->256 -> 256->1024 in the paper; the reference
README's results table lists the 1024x1024 "cascaded high-resolution" row,
reference README.md:41-52) — but the reference repo ships no way to chain
stages: every driver (sr.py/infer.py, reference infer.py:60-101) runs one
model over a prepared directory, and gluing stages means hand-feeding one
run's result PNGs through prepare_data.py into the next run's dataroot.

``run_cascade`` chains any number of stages in one process: stage 0 either
generates seeds unconditionally or super-resolves provided inputs, and
each following conditional stage consumes the previous stage's outputs
directly (bicubic up-resize to the stage's image_size between stages — the
same torchvision-convention resize as the offline prep tool,
data/prepare.py:34-51, so a chained stage sees exactly the conditioning
distribution it was trained on). Each stage runs as one batched mesh-wide
evaluator (GroupedEvaluator), so the cascade rides the same throughput
knees as validation.
"""

from __future__ import annotations

import gc
import logging
import os

import numpy as np
from PIL import Image

import sr3_tpu.utils.metrics as Metrics
from sr3_tpu.data.prepare import resize_and_convert
from sr3_tpu.training.evaluation import GroupedEvaluator, _group_size

logger = logging.getLogger("base")


def to_condition(img, size):
    """[-1,1] float (h,w,c) -> [-1,1] float (size,size,c) bicubic, through
    the uint8 PNG domain like the offline pipeline (prepare.py writes PNGs
    that lrhr.py re-reads; staying in that domain keeps the conditioning
    distribution identical to training)."""
    arr = Metrics.tensor2img(np.asarray(img), min_max=(-1, 1))
    pil = Image.fromarray(arr)
    pil = resize_and_convert(pil, size, Image.BICUBIC)
    return np.asarray(pil).astype(np.float32) / 127.5 - 1.0


def load_input_images(path):
    """Read a directory of images as [-1,1] float arrays (sorted order)."""
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith(exts)
    )
    if not files:
        raise ValueError(f"no images found in {path!r}")
    out = []
    for f in files:
        arr = np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
        out.append(arr.astype(np.float32) / 127.5 - 1.0)
    return out


def run_stage(opt, images=None, n_samples=None, base_rng=None):
    """Run one cascade stage; returns the stage outputs as [-1,1] floats.

    opt: parsed config (phase 'val', path.resume_state pointing at the
    stage's checkpoint). images: previous-stage outputs for a conditional
    stage; n_samples: count for an unconditional seed stage."""
    from sr3_tpu.training import create_model

    conditional_pre = opt["model"]["diffusion"]["conditional"]
    if not conditional_pre and (images is None and n_samples is None):
        raise ValueError(
            "unconditional stage '%s' needs n_samples" % opt.get("name")
        )
    if not opt["path"]["resume_state"]:
        logger.warning(
            "Cascade stage '%s' has no path.resume_state — sampling from "
            "RANDOMLY INITIALIZED weights (outputs will be noise; fine for "
            "smoke tests, wrong for real generation).", opt.get("name"),
        )
    diffusion = create_model(opt)
    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["val"], schedule_phase="val"
    )
    conditional = opt["model"]["diffusion"]["conditional"]
    size = int(opt["model"]["diffusion"]["image_size"])

    n = n_samples if images is None else len(images)
    ev = GroupedEvaluator(diffusion, _group_size(opt, n), base_rng=base_rng)
    outs = []
    if conditional:
        if images is None:
            raise ValueError(
                "conditional stage '%s' needs input images (previous stage "
                "outputs or -i dir)" % opt.get("name")
            )
        items = ({"SR": to_condition(img, size)} for img in images)
        for _item, sr in ev.run_sr(items, continous=False):
            outs.append(np.asarray(sr))
    else:
        for sample in ev.run_uncond(int(n_samples), continous=False):
            outs.append(np.asarray(sample))
    # free the stage's params/optimizer before the next stage compiles
    del ev, diffusion
    gc.collect()
    return outs


def run_cascade(opts, n_samples=None, input_images=None, out_dir=None,
                save_stages=True):
    """Chain the stages in ``opts``. Returns the final image list.

    Writes per-stage PNGs to out_dir ({stage}_{idx}_{res}.png; the last
    stage also as final_{idx}.png) when out_dir is set."""
    if input_images is not None and opts and not (
        opts[0]["model"]["diffusion"]["conditional"]
    ):
        raise ValueError(
            "input images were provided but the first stage '%s' is "
            "unconditional and would ignore them — drop -i, or start the "
            "cascade with a conditional stage" % opts[0].get("name")
        )
    images = input_images
    for k, opt in enumerate(opts):
        conditional = opt["model"]["diffusion"]["conditional"]
        size = opt["model"]["diffusion"]["image_size"]
        logger.info(
            "Cascade stage %d/%d: %s -> %d^2 (%s)", k + 1, len(opts),
            opt.get("name"), size,
            "conditional" if conditional else "unconditional",
        )
        images = run_stage(
            opt, images=images if conditional else None,
            n_samples=n_samples,
        )
        if out_dir and (save_stages or k == len(opts) - 1):
            os.makedirs(out_dir, exist_ok=True)
            for i, img in enumerate(images):
                Metrics.save_img(
                    Metrics.tensor2img(img, min_max=(-1, 1)),
                    os.path.join(out_dir, f"{k + 1}_{i + 1}_{size}.png"),
                )
    if out_dir:
        for i, img in enumerate(images):
            Metrics.save_img(
                Metrics.tensor2img(img, min_max=(-1, 1)),
                os.path.join(out_dir, f"final_{i + 1}.png"),
            )
    return images
