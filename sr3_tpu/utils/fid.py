"""FID / Inception Score — the two metrics the reference README table lists
but never implements (/root/reference/README.md:45-52 columns; no FID/IS code
exists anywhere in the reference — SURVEY §6).

Design: the *distance math* (Frechet distance between activation Gaussians,
KL-based Inception Score) is exact and feature-extractor-agnostic; the
*extractor* is pluggable because the canonical InceptionV3 weights cannot be
downloaded in an air-gapped environment:

- `RandomFeatureExtractor` — a seeded, untrained conv net (jax, runs on the
  TPU). Random-feature FID is an established proxy: it ranks model quality
  consistently with Inception-FID while using no pretrained weights
  (Naeem et al. 2020, "Reliable Fidelity and Diversity Metrics for
  Generative Models", and the random-feature baselines in Kynkäänniemi et
  al. 2023, "The Role of ImageNet Classes in FID"). Scores are comparable
  only across runs of the SAME extractor seed/config — not to published
  Inception-FID numbers.
- `fid_from_features` / `inception_score` accept features/logits from ANY
  extractor, so plugging a real InceptionV3 (e.g. exported features from a
  machine with egress, via `--features-npz`) yields the canonical metric.

All feature batching is jit-compiled; extraction runs column-major through
the MXU (one conv stack over NHWC batches).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- distance

def activation_statistics(feats):
    """(N, D) features -> (mu (D,), sigma (D, D)) of the fitted Gaussian."""
    feats = np.asarray(feats, np.float64)
    if feats.ndim != 2 or feats.shape[0] < 2:
        raise ValueError(f"need (N>=2, D) features, got {feats.shape}")
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)).

    sqrtm via scipy when available; else the eigenvalue identity
    Tr(sqrt(s1 s2)) = sum sqrt(eig(s1 s2)) (valid for PSD s1, s2).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    s2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2

    try:
        from scipy import linalg

        covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(s1.shape[0]) * eps
            covmean, _ = linalg.sqrtm((s1 + offset) @ (s2 + offset),
                                      disp=False)
        tr_covmean = np.trace(covmean.real)
    except ImportError:
        eigvals = np.linalg.eigvals(s1 @ s2)
        tr_covmean = np.sqrt(np.clip(eigvals.real, 0.0, None)).sum()

    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_covmean)


def fid_from_features(feats_a, feats_b):
    """FID between two (N, D) feature sets."""
    return frechet_distance(*activation_statistics(feats_a),
                            *activation_statistics(feats_b))


def inception_score(logits, splits=10):
    """(mean, std) of exp(E_x KL(p(y|x) || p(y))) over `splits` chunks.

    `logits` is (N, C) from any classifier head; with an InceptionV3 head
    this is the canonical IS (Salimans et al. 2016).
    """
    logits = np.asarray(logits, np.float64)
    if logits.ndim != 2:
        raise ValueError(f"need (N, C) logits, got {logits.shape}")
    logp = logits - logits.max(axis=1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(axis=1, keepdims=True))
    p = np.exp(logp)

    n = logits.shape[0]
    splits = max(1, min(splits, n))
    scores = []
    for chunk in np.array_split(np.arange(n), splits):
        pc = p[chunk]
        marginal = pc.mean(axis=0, keepdims=True)
        kl = (pc * (np.log(pc + 1e-16) - np.log(marginal + 1e-16))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


# --------------------------------------------------------------- extractor

class RandomFeatureExtractor:
    """Seeded untrained conv feature extractor (proxy-FID backbone).

    4 stride-2 3x3 conv+GELU stages then global mean/std pooling ->
    (N, 2*width) features. Deterministic in (seed, width); jit-compiled,
    runs on whatever backend jax provides (TPU in production).
    """

    def __init__(self, seed=0, width=192, image_size=None):
        import jax
        import jax.numpy as jnp

        self.seed, self.width = int(seed), int(width)
        keys = jax.random.split(jax.random.PRNGKey(self.seed), 4)
        chans = [3, width // 4, width // 2, width, width]
        self._kernels = [
            jax.random.normal(
                k, (3, 3, cin, cout), jnp.float32
            ) * np.sqrt(2.0 / (9 * cin))
            for k, cin, cout in zip(keys, chans[:-1], chans[1:])
        ]
        self._apply = jax.jit(self._forward)

    def _forward(self, x):
        import jax
        import jax.numpy as jnp

        for k in self._kernels:
            x = jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.gelu(x)
        mean = x.mean(axis=(1, 2))
        std = jnp.sqrt(x.var(axis=(1, 2)) + 1e-6)
        return jnp.concatenate([mean, std], axis=-1)

    def __call__(self, images_uint8, batch_size=64):
        """uint8 HWC images (list or (N,H,W,3) array) -> (N, 2*width)."""
        import jax.numpy as jnp

        arr = np.asarray(images_uint8)
        if arr.ndim == 3:
            arr = arr[None]
        x = arr.astype(np.float32) / 127.5 - 1.0
        out = []
        for i in range(0, len(x), batch_size):
            out.append(np.asarray(self._apply(jnp.asarray(x[i:i + batch_size]))))
        return np.concatenate(out, axis=0)
