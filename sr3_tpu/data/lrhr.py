"""Paired LR/SR/HR dataset over PNG directories or LMDB.

Capability-parity with the reference's LRHRDataset (data/LRHR_dataset.py:9-99):
- img mode: sorted recursive walks of `{root}/sr_{l}_{r}`, `{root}/hr_{r}`,
  `{root}/lr_{l}`;
- lmdb mode: keys `hr_{r}_{idx:05d}` / `sr_{l}_{r}_{idx:05d}` / `lr_{l}_{idx:05d}`
  with length from the `length` key and random resampling of invalid indices;
- `data_len` truncation, `need_LR` switch, output scaled to [-1, 1].

Beyond the reference: a decoded-sample RAM cache (``cache`` opt; auto-on when
the dataset fits 512MB) so small datasets aren't re-decoded every epoch —
augmentation is applied after decode, so caching uint8 arrays is lossless.
(With a cache plus a corrupt lmdb, the random-resample substitute for a
missing key is cached on first access instead of re-drawn per epoch.)

Output layout is NHWC float32 (TPU-native) instead of torch CHW tensors.
LMDB is optional: gated on import so the PNG path works without the package.
"""

from __future__ import annotations

import os
import random
from io import BytesIO

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (
    ".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG",
    ".ppm", ".PPM", ".bmp", ".BMP",
)


def get_paths_from_images(path):
    """Sorted recursive listing (reference data/util.py:15-24)."""
    assert os.path.isdir(path), f"{path} is not a valid directory"
    images = []
    for dirpath, _, fnames in sorted(os.walk(path)):
        for fname in sorted(fnames):
            if fname.endswith(IMG_EXTENSIONS):
                images.append(os.path.join(dirpath, fname))
    assert images, f"{path} has no valid image file"
    return sorted(images)


class LRHRDataset:
    """Map-style dataset; __getitem__ returns a dict of HWC float32 arrays in
    [-1, 1] plus 'Index'. The paired random horizontal flip is applied jointly
    to all images of a sample in train split (reference data/util.py:74-83)."""

    # auto-cache decoded samples when the whole dataset fits in this budget
    CACHE_AUTO_BYTES = 512 * 1024 * 1024

    def __init__(self, dataroot, datatype, l_resolution=16, r_resolution=128,
                 split="train", data_len=-1, need_LR=False, min_max=(-1, 1),
                 cache=None):
        self.datatype = datatype
        self.l_res = l_resolution
        self.r_res = r_resolution
        self.data_len = data_len
        self.need_LR = need_LR
        self.split = split
        self.min_max = min_max
        self._cache_opt = cache
        self._cache = None

        if datatype == "lmdb":
            try:
                import lmdb
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "datatype 'lmdb' requires the lmdb package; use "
                    "datatype 'img' or install lmdb"
                ) from e
            self.env = lmdb.open(
                dataroot, readonly=True, lock=False, readahead=False,
                meminit=False,
            )
            with self.env.begin(write=False) as txn:
                self.dataset_len = int(txn.get(b"length"))
            self.data_len = (
                self.dataset_len if self.data_len <= 0
                else min(self.data_len, self.dataset_len)
            )
        elif datatype == "img":
            self.sr_path = get_paths_from_images(
                f"{dataroot}/sr_{l_resolution}_{r_resolution}"
            )
            self.hr_path = get_paths_from_images(f"{dataroot}/hr_{r_resolution}")
            if need_LR:
                self.lr_path = get_paths_from_images(
                    f"{dataroot}/lr_{l_resolution}"
                )
            self.dataset_len = len(self.hr_path)
            self.data_len = (
                self.dataset_len if self.data_len <= 0
                else min(self.data_len, self.dataset_len)
            )
        else:
            raise NotImplementedError(f"data_type [{datatype}] is not recognized.")

        # decoded-sample RAM cache: decode each image once instead of every
        # epoch (augmentation randomness is applied after decode, so caching
        # uint8 arrays is lossless). cache=None → auto when the dataset fits
        # the budget; True/False force it.
        item_bytes = 3 * (2 * r_resolution ** 2 + (l_resolution ** 2
                                                   if need_LR else 0))
        auto = self.data_len * item_bytes <= self.CACHE_AUTO_BYTES
        if self._cache_opt if self._cache_opt is not None else auto:
            self._cache = {}

    def __len__(self):
        return self.data_len

    def _decoded(self, index):
        """uint8 HWC arrays {HR, SR, [LR]} for one sample, via the cache."""
        if self._cache is not None:
            hit = self._cache.get(index)
            if hit is not None:
                return hit
        img_hr, img_sr, img_lr = self._open(index)
        out = {
            "HR": np.asarray(img_hr.convert("RGB"), dtype=np.uint8),
            "SR": np.asarray(img_sr.convert("RGB"), dtype=np.uint8),
        }
        if self.need_LR:
            out["LR"] = np.asarray(img_lr.convert("RGB"), dtype=np.uint8)
        if self._cache is not None:
            self._cache[index] = out
        return out

    def _read_lmdb(self, index):
        with self.env.begin(write=False) as txn:
            def fetch(idx):
                hr = txn.get(f"hr_{self.r_res}_{str(idx).zfill(5)}".encode())
                sr = txn.get(
                    f"sr_{self.l_res}_{self.r_res}_{str(idx).zfill(5)}".encode()
                )
                lr = (
                    txn.get(f"lr_{self.l_res}_{str(idx).zfill(5)}".encode())
                    if self.need_LR else None
                )
                return hr, sr, lr

            hr, sr, lr = fetch(index)
            # skip invalid indices by random resample (reference :67-82)
            while hr is None or sr is None:
                hr, sr, lr = fetch(random.randint(0, self.data_len - 1))
        img_hr = Image.open(BytesIO(hr))
        img_sr = Image.open(BytesIO(sr))
        img_lr = Image.open(BytesIO(lr)) if self.need_LR else None
        return img_hr, img_sr, img_lr

    def _open(self, index):
        if self.datatype == "lmdb":
            return self._read_lmdb(index)
        img_hr = Image.open(self.hr_path[index])
        img_sr = Image.open(self.sr_path[index])
        img_lr = Image.open(self.lr_path[index]) if self.need_LR else None
        return img_hr, img_sr, img_lr

    def get_raw_bytes(self, index):
        """Decode-free fast path: compressed PNG bytes + the joint flip
        decision; the loader's native pipeline decodes+normalizes in C++
        (libpng) worker threads. img mode only returns bytes for .png files."""
        if self._cache is not None:
            # decode-once beats re-decoding compressed bytes every epoch:
            # steer the loader to the raw (cached) path
            return None
        out = {"Index": index,
               "flip": self.split == "train" and random.random() < 0.5}
        if self.datatype == "lmdb":
            with self.env.begin(write=False) as txn:
                hr = txn.get(f"hr_{self.r_res}_{str(index).zfill(5)}".encode())
                sr = txn.get(
                    f"sr_{self.l_res}_{self.r_res}_{str(index).zfill(5)}".encode()
                )
                if hr is None or sr is None:
                    return None  # let the caller fall back to resampling path
                out["HR"] = hr
                out["SR"] = sr
                if self.need_LR:
                    lr = txn.get(
                        f"lr_{self.l_res}_{str(index).zfill(5)}".encode()
                    )
                    if lr is None:
                        return None
                    out["LR"] = lr
            return out
        paths = {"HR": self.hr_path[index], "SR": self.sr_path[index]}
        if self.need_LR:
            paths["LR"] = self.lr_path[index]
        for k, p in paths.items():
            if not p.lower().endswith(".png"):
                return None
            with open(p, "rb") as f:
                out[k] = f.read()
        return out

    @property
    def key_resolutions(self):
        """Expected (h, w) per batch key for the native decoder."""
        res = {"HR": (self.r_res, self.r_res), "SR": (self.r_res, self.r_res)}
        if self.need_LR:
            res["LR"] = (self.l_res, self.l_res)
        return res

    def get_raw(self, index):
        """Decode-only fast path: uint8 HWC images + the joint flip decision.
        The loader's native collate fuses normalize+flip+stack in C++."""
        return {
            **self._decoded(index),
            "Index": index,
            "flip": self.split == "train" and random.random() < 0.5,
        }

    def __getitem__(self, index):
        dec = self._decoded(index)
        keys = (["LR", "SR", "HR"] if self.need_LR else ["SR", "HR"])
        arrays = [dec[k].astype(np.float32) / 255.0 for k in keys]

        if self.split == "train" and random.random() < 0.5:
            arrays = [a[:, ::-1, :].copy() for a in arrays]

        lo, hi = self.min_max
        arrays = [a * (hi - lo) + lo for a in arrays]

        if self.need_LR:
            lr, sr, hr = arrays
            return {"LR": lr, "HR": hr, "SR": sr, "Index": index}
        sr, hr = arrays
        return {"HR": hr, "SR": sr, "Index": index}
