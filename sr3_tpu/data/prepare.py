"""Offline dataset preparation tool (reference data/prepare_data.py).

Resizes each source image into an (lr, hr, sr) triplet — sr is the
bicubic-upsampled lr at hr resolution — and writes either PNG directories
``lr_{l}/ hr_{r}/ sr_{l}_{r}/`` or a single LMDB with keys
``lr_{l}_{idx:05d}`` / ``hr_{r}_{idx:05d}`` / ``sr_{l}_{r}_{idx:05d}`` and a
``length`` entry (reference data/prepare_data.py:74-92).

Fan-out uses a multiprocessing Pool over file shards (the reference rolls its
own Process + RawValue counter, :50-134).

Usage:
  python -m sr3_tpu.data.prepare --path <src> --out <dst> --size 16,128
         [--n_worker 8] [--resample bicubic] [--lmdb]
"""

from __future__ import annotations

import argparse
import functools
import multiprocessing
import os
from glob import glob

from PIL import Image

RESAMPLE = {
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "lanczos": Image.LANCZOS,
}


def resize_and_convert(img, size, resample):
    """Aspect-preserving resize of the shorter edge to ``size``, then center
    crop to size x size — torchvision resize/center_crop semantics, matching
    the reference pixel-for-pixel (data/prepare_data.py:17-21) so datasets
    prepared here are identical to reference-prepared ones. Like the
    reference, a no-op when the width already matches."""
    if img.size[0] != size:
        w, h = img.size
        if w <= h:
            nw, nh = size, int(size * h / w)
        else:
            nw, nh = int(size * w / h), size
        img = img.resize((nw, nh), resample=resample)
        w, h = img.size
        left = int(round((w - size) / 2.0))
        top = int(round((h - size) / 2.0))
        img = img.crop((left, top, left + size, top + size))
    return img


def resize_multiple(img, sizes=(16, 128), resample=Image.BICUBIC):
    """(reference data/prepare_data.py:30-39): LR at sizes[0], HR at
    sizes[1], SR = LR upsampled to sizes[1] with the SAME user-selected
    resample filter (not hardcoded bicubic)."""
    lr = resize_and_convert(img, sizes[0], resample)
    hr = resize_and_convert(img, sizes[1], resample)
    sr = resize_and_convert(lr, sizes[1], resample)
    return lr, hr, sr


def _process_one(file, sizes, resample):
    """Key each triplet by the source filename stem (reference
    data/prepare_data.py:41-47), not the enumeration order."""
    img = Image.open(file).convert("RGB")
    stem = os.path.splitext(os.path.basename(file))[0]
    return stem, resize_multiple(img, sizes=sizes, resample=resample)


def prepare(img_path, out_path, n_worker=1, sizes=(16, 128),
            resample=Image.BICUBIC, lmdb_save=False):
    files = sorted(
        f for ext in ("*.jpg", "*.jpeg", "*.png", "*.bmp", "*.ppm")
        for f in glob(os.path.join(img_path, "**", ext), recursive=True)
    )
    if not files:
        raise SystemExit(f"no images found under {img_path}")

    l, r = sizes
    if lmdb_save:
        import lmdb

        env = lmdb.open(out_path, map_size=1024 ** 4, readahead=False)
    else:
        env = None
        os.makedirs(f"{out_path}/lr_{l}", exist_ok=True)
        os.makedirs(f"{out_path}/hr_{r}", exist_ok=True)
        os.makedirs(f"{out_path}/sr_{l}_{r}", exist_ok=True)

    worker = functools.partial(_process_one, sizes=sizes, resample=resample)
    if n_worker > 1:
        with multiprocessing.Pool(n_worker) as pool:
            results = pool.map(worker, files)
    else:
        results = [worker(f) for f in files]

    total = 0
    for stem, (lr_img, hr_img, sr_img) in sorted(results):
        key = stem.zfill(5)
        if env is None:
            lr_img.save(f"{out_path}/lr_{l}/{key}.png")
            hr_img.save(f"{out_path}/hr_{r}/{key}.png")
            sr_img.save(f"{out_path}/sr_{l}_{r}/{key}.png")
        else:
            from io import BytesIO

            with env.begin(write=True) as txn:
                for tag, im in (
                    (f"lr_{l}_{key}", lr_img),
                    (f"hr_{r}_{key}", hr_img),
                    (f"sr_{l}_{r}_{key}", sr_img),
                ):
                    buf = BytesIO()
                    im.save(buf, format="PNG")
                    txn.put(tag.encode(), buf.getvalue())
        total += 1
        if env is not None:
            with env.begin(write=True) as txn:
                txn.put(b"length", str(total).encode())
    print(f"prepared {total} triplets -> {out_path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", "-p", type=str, required=True)
    parser.add_argument("--out", "-o", type=str, required=True)
    parser.add_argument("--size", "-s", type=str, default="16,128")
    parser.add_argument("--n_worker", "-n", type=int, default=1)
    parser.add_argument("--resample", "-r", type=str, default="bicubic",
                        choices=sorted(RESAMPLE))
    parser.add_argument("--lmdb", "-l", action="store_true")
    args = parser.parse_args()

    sizes = tuple(int(s.strip()) for s in args.size.split(","))
    prepare(
        args.path, args.out, n_worker=args.n_worker, sizes=sizes,
        resample=RESAMPLE[args.resample], lmdb_save=args.lmdb,
    )


if __name__ == "__main__":
    main()
