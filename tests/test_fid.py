"""FID/IS math + proxy extractor (sr3_tpu/utils/fid.py, tools/fid_eval.py).

The reference lists FID/IS in its README metric table but ships no
implementation (SURVEY §6); these are beyond-parity, so the tests pin the
math to closed forms rather than to reference behavior.
"""

import numpy as np

from sr3_tpu.utils import fid as F


def test_frechet_identical_stats_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((256, 8))
    mu, sigma = F.activation_statistics(feats)
    assert abs(F.frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_closed_form_diagonal():
    """For diagonal Gaussians: ||dmu||^2 + sum (sqrt(v1)-sqrt(v2))^2."""
    mu1, mu2 = np.array([0.0, 0.0]), np.array([1.0, -2.0])
    v1, v2 = np.array([1.0, 4.0]), np.array([9.0, 1.0])
    want = ((mu1 - mu2) ** 2).sum() + ((np.sqrt(v1) - np.sqrt(v2)) ** 2).sum()
    got = F.frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_frechet_eig_fallback_matches_scipy():
    """The no-scipy eigenvalue path computes the same trace term."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((64, 6))
    b = rng.standard_normal((64, 6)) * 2 + 1
    mu1, s1 = F.activation_statistics(a)
    mu2, s2 = F.activation_statistics(b)
    want = F.frechet_distance(mu1, s1, mu2, s2)

    eig = np.linalg.eigvals(s1 @ s2)
    tr = np.sqrt(np.clip(eig.real, 0, None)).sum()
    diff = mu1 - mu2
    got = float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * tr)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_fid_orders_quality():
    """Features closer to the real distribution score lower."""
    rng = np.random.default_rng(2)
    real = rng.standard_normal((512, 16))
    near = real + 0.1 * rng.standard_normal((512, 16))
    far = 3.0 + 2.0 * rng.standard_normal((512, 16))
    assert F.fid_from_features(real, near) < F.fid_from_features(real, far)


def test_inception_score_bounds():
    """Uniform predictions -> IS 1; one-hot over C classes -> IS C."""
    n, c = 200, 5
    m, s = F.inception_score(np.zeros((n, c)), splits=4)
    np.testing.assert_allclose(m, 1.0, atol=1e-6)
    assert s < 1e-6

    onehot = np.full((n, c), -50.0)
    onehot[np.arange(n), np.arange(n) % c] = 50.0
    m, _ = F.inception_score(onehot, splits=1)
    np.testing.assert_allclose(m, float(c), rtol=1e-3)


def test_random_extractor_deterministic_and_shaped():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    ex1 = F.RandomFeatureExtractor(seed=7, width=64)
    ex2 = F.RandomFeatureExtractor(seed=7, width=64)
    f1, f2 = ex1(imgs, batch_size=4), ex2(imgs)
    assert f1.shape == (6, 128)
    np.testing.assert_allclose(f1, f2, atol=1e-6)
    assert not np.allclose(f1, F.RandomFeatureExtractor(seed=8, width=64)(imgs))


def test_fid_eval_cli(tmp_path):
    """End-to-end over the reference results layout (*_hr/_sr pairs)."""
    import subprocess
    import sys

    import sr3_tpu.utils.metrics as Metrics

    rng = np.random.default_rng(4)
    for i in range(4):
        hr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        sr = np.clip(
            hr.astype(int) + rng.integers(-12, 12, hr.shape), 0, 255
        ).astype(np.uint8)
        Metrics.save_img(hr, str(tmp_path / f"{i}_0_hr.png"))
        Metrics.save_img(sr, str(tmp_path / f"{i}_0_sr.png"))

    out = subprocess.run(
        [sys.executable, "tools/fid_eval.py", "-p", str(tmp_path),
         "--width", "32"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "proxy-FID" in out.stdout


def test_fid_eval_cli_features_npz(tmp_path):
    import subprocess
    import sys

    rng = np.random.default_rng(5)
    np.savez(
        tmp_path / "f.npz",
        real=rng.standard_normal((64, 8)),
        fake=rng.standard_normal((64, 8)) + 0.5,
        logits=rng.standard_normal((64, 10)),
    )
    out = subprocess.run(
        [sys.executable, "tools/fid_eval.py",
         "--features-npz", str(tmp_path / "f.npz")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "# FID" in out.stdout and "# IS" in out.stdout
