"""Cascaded multi-stage generation driver (SR3 paper pipeline).

The reference README lists the 1024x1024 "cascaded high-resolution" result
row (reference README.md:41-52) but ships no cascade driver — each stage's
outputs must be hand-prepared into the next stage's dataroot. This driver
chains any number of stage configs in one run (sr3_tpu/training/cascade.py):

  # unconditional 128^2 seeds -> 128->1024 SR
  python cascade.py -c configs/sample_sr3_128.json \
                    -c configs/sr_sr3_128_1024.json -n 4 -o results/cascade

  # start from a directory of low-res images instead
  python cascade.py -i my_16px_faces/ -c configs/sr_sr3_16_128.json \
                    -c configs/sr_sr3_128_1024.json -o results/cascade

Per stage, set ``path.resume_state`` in the config (or pass one -r per -c,
in order) to its trained checkpoint. Between stages the outputs are
bicubic-resized to the next stage's image_size with the offline prep
tool's exact resize (data/prepare.py), so each stage sees the conditioning
distribution it trained on.
"""

import argparse
import logging
from types import SimpleNamespace

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import sr3_tpu.utils.config as Logger
from sr3_tpu.training.cascade import load_input_images, run_cascade


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", action="append", required=True,
                        help="stage config; repeat in cascade order")
    parser.add_argument("-r", "--resume", action="append", default=None,
                        help="per-stage resume_state override (repeat, "
                             "in -c order; '-' keeps the config's value)")
    parser.add_argument("-n", "--n_samples", type=int, default=4,
                        help="sample count when stage 1 is unconditional")
    parser.add_argument("-i", "--input", type=str, default=None,
                        help="directory of images seeding a conditional "
                             "stage 1")
    parser.add_argument("-o", "--out", type=str, default=None,
                        help="output dir (default: first stage's results)")
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)
    parser.add_argument("-debug", "-d", action="store_true")
    return parser.parse_args()


def main():
    args = parse_args()
    opts = []
    for k, cfg in enumerate(args.config):
        stage_args = SimpleNamespace(
            config=cfg, phase="val", gpu_ids=args.gpu_ids, debug=args.debug,
        )
        opt = Logger.dict_to_nonedict(Logger.parse(stage_args))
        if args.resume and k < len(args.resume) and args.resume[k] != "-":
            opt["path"]["resume_state"] = args.resume[k]
        opts.append(opt)

    Logger.setup_logger(None, opts[0]["path"]["log"], "train",
                        level=logging.INFO, screen=True)
    logger = logging.getLogger("base")

    input_images = load_input_images(args.input) if args.input else None
    out_dir = args.out or opts[0]["path"]["results"]
    images = run_cascade(
        opts, n_samples=args.n_samples, input_images=input_images,
        out_dir=out_dir,
    )
    logger.info("Cascade done: %d images at %s in %s", len(images),
                f"{images[0].shape[0]}^2" if images else "-", out_dir)


if __name__ == "__main__":
    main()
