"""Offline prep tool: source images -> lr/hr/sr triplets readable by the
dataset (reference data/prepare_data.py round trip)."""

import os

import numpy as np
from PIL import Image

from sr3_tpu.data.lrhr import LRHRDataset
from sr3_tpu.data.prepare import prepare, resize_multiple
import pytest

pytestmark = pytest.mark.quick


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


def test_resize_matches_torchvision_reference():
    """resize_and_convert must be pixel-identical to the reference's
    torchvision resize(shorter-edge)+center_crop pipeline
    (data/prepare_data.py:17-21), else prepared datasets skew metric
    comparisons against published numbers."""
    import pytest

    from sr3_tpu.data.prepare import resize_and_convert

    # geometry check (torchvision-free): shorter edge scales to size
    # preserving aspect, then a centered crop — NOT square-crop-then-resize.
    # 80x121 -> resize(16): 16x24 -> crop rows [4,20). With NEAREST and a
    # row-index image the surviving rows map back to source rows ~[20,101),
    # so the mean must sit near the middle, and the top row must NOT be 0
    # (square-crop-first would keep row 0).
    col = np.broadcast_to(
        np.arange(121, dtype=np.uint8)[:, None, None], (121, 80, 3)
    ).copy()
    img = Image.fromarray(col)
    out = np.asarray(resize_and_convert(img, 16, Image.NEAREST))
    assert out.shape == (16, 16, 3)
    assert out[0, 0, 0] > 10  # top rows were cropped away
    assert out[-1, 0, 0] < 110  # bottom rows were cropped away
    assert abs(int(out.astype(int).mean()) - 60) <= 6  # centered

    trans_fn = pytest.importorskip("torchvision.transforms").functional
    rng = np.random.default_rng(5)
    for shape in ((80, 121, 3), (121, 80, 3), (97, 97, 3)):
        img = Image.fromarray(rng.integers(0, 255, shape).astype(np.uint8))
        for size in (16, 33):
            ours = resize_and_convert(img, size, Image.BICUBIC)
            ref = trans_fn.center_crop(
                trans_fn.resize(img, size, trans_fn.InterpolationMode.BICUBIC),
                size,
            )
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_prepare_keys_by_filename_stem(tmp_path):
    """Outputs are keyed by zero-padded source stems (reference
    data/prepare_data.py:41-47,74-78), not enumeration order."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    rng = np.random.default_rng(3)
    for name in ("7", "42"):
        Image.fromarray(
            rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
        ).save(src / f"{name}.png")
    prepare(str(src), str(out), n_worker=1, sizes=(8, 16))
    assert sorted(os.listdir(out / "hr_16")) == ["00007.png", "00042.png"]
