"""Image-list transforms (reference data/util.py:27-83).

The active training path applies the paired random horizontal flip inside
LRHRDataset / the native collate kernel. This module keeps the full transform
API surface: the legacy joint augment (hflip / vflip / rot90 — present but
unused in the reference after issue #14) and the totensor-style conversion
helpers, numpy-native.
"""

from __future__ import annotations

import random

import numpy as np


def augment(img_list, hflip=True, rot=True, split="val"):
    """Jointly flip/rotate a list of HWC arrays (train split only), one
    random draw shared by the whole list (reference data/util.py:27-42)."""
    hflip = hflip and (split == "train" and random.random() < 0.5)
    vflip = rot and (split == "train" and random.random() < 0.5)
    rot90 = rot and (split == "train" and random.random() < 0.5)

    def _augment(img):
        if hflip:
            img = img[:, ::-1, :]
        if vflip:
            img = img[::-1, :, :]
        if rot90:
            img = img.transpose(1, 0, 2)
        return img

    return [_augment(img) for img in img_list]


def transform2numpy(img):
    """PIL/array -> float32 HWC in [0,1]; 2D promoted, >3 channels cropped
    (reference data/util.py:45-53)."""
    img = np.array(img)
    img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)
    if img.shape[2] > 3:
        img = img[:, :, :3]
    return img


def rescale(img, min_max=(0, 1)):
    """[0,1] -> [min_max] (reference data/util.py:56-62, NHWC instead of CHW)."""
    return img * (min_max[1] - min_max[0]) + min_max[0]


def transform_augment(img_list, split="val", min_max=(0, 1)):
    """ToTensor + joint hflip + rescale (reference data/util.py:74-83),
    returning float32 HWC arrays."""
    imgs = [transform2numpy(img) for img in img_list]
    if split == "train" and random.random() < 0.5:
        imgs = [img[:, ::-1, :].copy() for img in imgs]
    return [rescale(img, min_max) for img in imgs]
