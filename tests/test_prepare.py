"""Offline prep tool: source images -> lr/hr/sr triplets readable by the
dataset (reference data/prepare_data.py round trip)."""

import os

import numpy as np
from PIL import Image

from sr3_tpu.data.lrhr import LRHRDataset
from sr3_tpu.data.prepare import prepare, resize_multiple


def test_resize_multiple_shapes():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 120, 3)).astype(np.uint8)
    )
    lr, hr, sr = resize_multiple(img, sizes=(16, 64))
    assert lr.size == (16, 16)
    assert hr.size == (64, 64)
    assert sr.size == (64, 64)  # bicubic-upsampled lr


def test_prepare_roundtrip(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (70, 70, 3)).astype(np.uint8)
        ).save(src / f"im{i}.png")

    prepare(str(src), str(out), n_worker=1, sizes=(16, 32))

    for sub in ("lr_16", "hr_32", "sr_16_32"):
        files = os.listdir(out / sub)
        assert len(files) == 3, sub

    ds = LRHRDataset(str(out), "img", 16, 32, split="val", need_LR=True)
    assert len(ds) == 3
    item = ds[0]
    assert item["HR"].shape == (32, 32, 3)
    assert item["LR"].shape == (16, 16, 3)
    assert item["SR"].shape == (32, 32, 3)


def test_prepare_multiworker(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    rng = np.random.default_rng(2)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        ).save(src / f"im{i}.png")
    prepare(str(src), str(out), n_worker=2, sizes=(8, 16))
    assert len(os.listdir(out / "hr_16")) == 4
