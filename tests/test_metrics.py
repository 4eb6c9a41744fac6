"""PSNR/SSIM golden tests vs cv2 (the reference's numerics) and tensor2img
layout checks."""

import numpy as np
import pytest

from sr3_tpu.utils import metrics as M

pytestmark = pytest.mark.quick


def test_psnr_identical_images_inf():
    img = np.zeros((32, 32, 3), np.uint8)
    assert M.calculate_psnr(img, img) == float("inf")


def test_psnr_known_value():
    a = np.zeros((16, 16), np.uint8)
    b = np.full((16, 16), 10, np.uint8)
    # mse = 100 -> psnr = 20 log10(255/10)
    np.testing.assert_allclose(
        M.calculate_psnr(a, b), 20 * np.log10(255.0 / 10.0), rtol=1e-9
    )


def test_ssim_identical_is_one(rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    assert M.calculate_ssim(img, img) == pytest.approx(1.0, abs=1e-9)


def test_ssim_matches_cv2_reference(rng):
    cv2 = pytest.importorskip("cv2")
    a = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    b = np.clip(
        a.astype(np.int32) + rng.integers(-20, 20, a.shape), 0, 255
    ).astype(np.uint8)

    # reference implementation verbatim semantics via cv2
    def ref_ssim(img1, img2):
        C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        img1 = img1.astype(np.float64)
        img2 = img2.astype(np.float64)
        kernel = cv2.getGaussianKernel(11, 1.5)
        window = np.outer(kernel, kernel.transpose())
        mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
        mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
        s1 = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1 ** 2
        s2 = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2 ** 2
        s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1 * mu2
        return (
            ((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
            / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
        ).mean()

    np.testing.assert_allclose(M.ssim(a, b), ref_ssim(a, b), rtol=1e-10)


def test_ssim_pure_numpy_fallback_matches(rng, monkeypatch):
    a = rng.integers(0, 255, (48, 48)).astype(np.uint8)
    b = rng.integers(0, 255, (48, 48)).astype(np.uint8)
    with_cv2 = M.ssim(a, b)
    monkeypatch.setattr(M, "_HAS_CV2", False)
    without = M.ssim(a, b)
    np.testing.assert_allclose(without, with_cv2, rtol=1e-8)


def test_tensor2img_range_and_layout():
    x = np.linspace(-1, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(1, 8, 8, 2 * 3)
    x = np.linspace(-1, 1, 8 * 8 * 3, dtype=np.float32).reshape(1, 8, 8, 3)
    img = M.tensor2img(x)
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255


def test_tensor2img_grid_for_batches():
    x = np.zeros((4, 8, 8, 3), np.float32)
    img = M.tensor2img(x)
    # 2x2 grid with 2px padding: 2*8 + 3*2 = 22
    assert img.shape == (22, 22, 3)


def test_tensor2img_clips():
    x = np.full((1, 2, 2, 3), -5.0, np.float32)
    x[0, 0, 0] = 5.0
    x[0, 0, 1] = 0.0
    img = M.tensor2img(x)
    assert img[0, 0].tolist() == [255, 255, 255]
    assert img[0, 1].tolist() == [128, 128, 128]
    assert img[1, 1].tolist() == [0, 0, 0]
