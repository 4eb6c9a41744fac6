"""Generate a tiny deterministic LR/SR/HR fixture dataset for tests & debug
runs (the reference bundles real face crops under dataset/; we synthesize
smooth random images instead so the repo carries no external data)."""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sr3_tpu.data.prepare import prepare  # noqa: E402


def make_sources(path, n=6, size=256, seed=0):
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        # smooth "image-like" noise: upsampled low-freq noise + gradient
        low = rng.uniform(0, 255, (8, 8, 3))
        img = np.asarray(
            Image.fromarray(low.astype(np.uint8)).resize(
                (size, size), Image.BICUBIC
            ),
            dtype=np.float32,
        )
        yy, xx = np.mgrid[0:size, 0:size] / size
        img[..., 0] = 0.7 * img[..., 0] + 0.3 * 255 * yy
        img[..., 2] = 0.7 * img[..., 2] + 0.3 * 255 * xx
        Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(
            os.path.join(path, f"src_{i:03d}.png")
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dataset/fixtures_16_128")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--size", default="16,128")
    args = ap.parse_args()
    src = args.out + "_src"
    sizes = tuple(int(s) for s in args.size.split(","))
    make_sources(src, n=args.n, size=max(sizes[1], 256))
    prepare(src, args.out, sizes=sizes)
    import shutil

    shutil.rmtree(src)
