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


class InceptionV3FeatureExtractor:
    """Canonical-scale FID extractor: torchvision InceptionV3 pooled
    features (2048-d) + class logits for IS.

    The reference never computes FID/IS at all; this makes the numbers
    comparable to the published torchvision-Inception convention (resize
    to 299, ImageNet normalization, avgpool features). Weight loading is
    offline-tolerant, in order:

    1. ``weights=`` path (or ``SR3_INCEPTION_WEIGHTS`` env): a local
       torchvision ``inception_v3`` state_dict.
    2. torchvision's pretrained download, when the machine has egress.
    3. Random init + a loud warning — the math still runs, but scores are
       then run-local (proxy-grade), NOT on the published scale.
    """

    def __init__(self, weights=None, device="cpu"):
        import os
        import logging

        import torch
        from torchvision.models import inception_v3

        self.torch = torch
        self.device = torch.device(device)
        if weights is not False:
            weights = weights or os.environ.get("SR3_INCEPTION_WEIGHTS")
        net = inception_v3(weights=None, aux_logits=True, init_weights=False)
        self.canonical = False
        if weights is False:
            pass  # explicit random init (tests / air-gapped smoke runs)
        elif weights:
            state = torch.load(weights, map_location="cpu")
            net.load_state_dict(state)
            self.canonical = True
        else:
            try:
                from torchvision.models import Inception_V3_Weights

                net = inception_v3(
                    weights=Inception_V3_Weights.IMAGENET1K_V1
                )
                self.canonical = True
            except Exception:
                logging.getLogger("base").warning(
                    "InceptionV3 weights unavailable (no local path, no "
                    "egress) — running with RANDOM init: FID/IS are NOT on "
                    "the published scale. Provide SR3_INCEPTION_WEIGHTS."
                )
        net.eval().to(self.device)
        self._net = net
        self._feats = None
        # capture pooled features right before the classifier head
        net.avgpool.register_forward_hook(
            lambda m, i, o: setattr(self, "_feats", o)
        )

    def _preprocess(self, arr):
        torch = self.torch
        x = torch.from_numpy(
            np.ascontiguousarray(arr.transpose(0, 3, 1, 2))
        ).float() / 255.0
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False
        )
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return ((x - mean) / std).to(self.device)

    def _run(self, images_uint8, batch_size):
        arr = np.asarray(images_uint8)
        if arr.ndim == 3:
            arr = arr[None]
        feats, logits = [], []
        with self.torch.no_grad():
            for i in range(0, len(arr), batch_size):
                out = self._net(self._preprocess(arr[i:i + batch_size]))
                logits.append(out.cpu().numpy())
                feats.append(
                    self.torch.flatten(self._feats, 1).cpu().numpy()
                )
        return np.concatenate(feats, 0), np.concatenate(logits, 0)

    def __call__(self, images_uint8, batch_size=32):
        """uint8 HWC images -> (N, 2048) pooled features."""
        return self._run(images_uint8, batch_size)[0]

    def features_and_logits(self, images_uint8, batch_size=32):
        """-> ((N, 2048) features, (N, 1000) logits) in one pass; the
        logits feed `inception_score`."""
        return self._run(images_uint8, batch_size)
