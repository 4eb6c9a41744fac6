"""Is torch's orthogonal init a different DISTRIBUTION from flax's?
(VERDICT r04 weak #1: the −1.1 dB head-to-head offset's "obvious untested
suspect".)

The suspicion: torch ``init.orthogonal_`` orthogonalizes the (out, in*k*k)
matricization of a conv weight (torch/nn/init.py) while flax
``initializers.orthogonal()`` works on the (k*k*in, out) matricization —
"for non-square conv shapes these are different distributions (different
per-filter norms)".

The math says otherwise. Both samplers QR-decompose a Gaussian matrix shaped
(max_dim, min_dim) with R-diagonal sign correction, producing a Haar-uniform
point on the Stiefel manifold V_min(R^max), and both then lay the SAME object
into the weight: `out` filter vectors of length fan_in = in*k*k such that
  - fan_in >= out: the filters are orthonormal (torch: rows of the
    transposed tall Q; flax: columns of Q);
  - fan_in <  out: the filters are the rows of a column-orthonormal
    (out, fan_in) matrix (per-filter norms vary, E[|f|^2] = fan_in/out).
Transposition and the flattening order (in-major vs kh-major) are index
permutations / reflections, under which the Haar-Stiefel distribution is
invariant. So the distributions coincide for EVERY conv/dense shape.

This tool verifies that empirically for every weight-shape family in the
head-to-head model (tools/quality_headtohead.py PROTO): per-filter norm
moments, Gram-matrix residuals, and a two-sample KS test on pooled filter
norms, torch vs flax, N samples each. Writes docs/INIT_DIST_r05.json.

Reference: /root/reference/model/networks.py:45-57 (orthogonal_ on every
Conv/Linear, gain 1, zero bias) — mirrored by models/unet.py:_kernel_init.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# (kh, kw, in, out) conv shapes / (in, out) dense shapes spanning every
# matricization regime in the h2h model (ic=32, mults 1,2,4,8) plus the
# flagship stem where fan_in < out (3*3*6=54 < 64):
CONV_SHAPES = [
    (3, 3, 6, 32),     # h2h stem: fan_in 54 >= out 32
    (3, 3, 6, 64),     # flagship stem: fan_in 54 < out 64 (the "hard" case)
    (3, 3, 32, 64),    # down-path expand
    (3, 3, 256, 256),  # square deep conv
    (1, 1, 32, 64),    # res_conv 1x1
    (1, 1, 128, 384),  # attention qkv
]
DENSE_SHAPES = [
    (32, 128),   # cond_mlp_dense0 (in < out)
    (128, 32),   # cond_mlp_dense1 (in > out)
    (32, 256),   # FiLM cond_proj
]
N_SAMPLES = 64


def torch_conv_sample(shape_hwio, seed):
    import torch
    from torch.nn import init

    kh, kw, cin, cout = shape_hwio
    torch.manual_seed(seed)
    w = torch.empty(cout, cin, kh, kw)
    init.orthogonal_(w, gain=1)
    # -> (out, fan_in) filter matrix, torch's own matricization
    return w.reshape(cout, -1).numpy()


def torch_dense_sample(shape_io, seed):
    import torch
    from torch.nn import init

    cin, cout = shape_io
    torch.manual_seed(seed)
    w = torch.empty(cout, cin)
    init.orthogonal_(w, gain=1)
    return w.numpy()  # (out, in)


def flax_conv_sample(shape_hwio, seed):
    import jax
    from flax import linen as nn

    w = nn.initializers.orthogonal()(
        jax.random.PRNGKey(seed), shape_hwio, np.float32
    )
    kh, kw, cin, cout = shape_hwio
    # -> (out, fan_in): transpose of flax's (fan_in, out) matricization
    return np.asarray(w).reshape(kh * kw * cin, cout).T


def flax_dense_sample(shape_io, seed):
    import jax
    from flax import linen as nn

    w = nn.initializers.orthogonal()(
        jax.random.PRNGKey(seed), shape_io, np.float32
    )
    return np.asarray(w).T  # (out, in)


def gram_residual(f):
    """|G - I| over whichever Gram is the orthonormality claim."""
    out, fan = f.shape
    if fan >= out:
        g = f @ f.T - np.eye(out, dtype=f.dtype)      # filters orthonormal
    else:
        g = f.T @ f - np.eye(fan, dtype=f.dtype)      # columns orthonormal
    return float(np.abs(g).max())


def ks_2samp(a, b):
    """Two-sample KS statistic + asymptotic p (no scipy dependency)."""
    a, b = np.sort(a), np.sort(b)
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    d = float(np.abs(ca - cb).max())
    en = np.sqrt(len(a) * len(b) / (len(a) + len(b)))
    lam = (en + 0.12 + 0.11 / en) * d
    j = np.arange(1, 101)
    p = float(2 * np.sum((-1) ** (j - 1) * np.exp(-2 * (lam * j) ** 2)))
    return d, min(max(p, 0.0), 1.0)


def analyze(kind, shape, torch_fn, flax_fn):
    # fan_in >= out -> filter norms are degenerate (all 1.0): a handful of
    # samples certifies that; the KS power is only needed where norms vary
    out, fan = (shape[-1], int(np.prod(shape[:-1])))
    n = N_SAMPLES if fan < out else 8
    tn, fn_, tg, fg = [], [], [], []
    for s in range(n):
        ft = torch_fn(shape, 10_000 + s)
        ff = flax_fn(shape, 20_000 + s)
        tn.append(np.linalg.norm(ft, axis=1))
        fn_.append(np.linalg.norm(ff, axis=1))
        tg.append(gram_residual(ft))
        fg.append(gram_residual(ff))
    tn = np.concatenate(tn)
    fn_ = np.concatenate(fn_)
    row = dict(
        kind=kind, shape=list(shape), out=out, fan_in=fan,
        regime="orthonormal_filters" if fan >= out else "overcomplete",
        torch_filter_norm=dict(mean=round(float(tn.mean()), 6),
                               std=round(float(tn.std()), 6)),
        flax_filter_norm=dict(mean=round(float(fn_.mean()), 6),
                              std=round(float(fn_.std()), 6)),
        expected_mean_sq=round(min(fan, out) / out, 6),
        torch_gram_resid_max=round(float(np.max(tg)), 7),
        flax_gram_resid_max=round(float(np.max(fg)), 7),
    )
    # fan_in >= out: the filter-norm law is DEGENERATE (all exactly 1 —
    # that is the verdict's "different per-filter norms" claim refuted
    # outright); a KS test there only measures float-rounding noise, so
    # certify |norm - 1| <= fp tolerance on both sides instead.
    if row["regime"] == "orthonormal_filters":
        row["torch_max_dev_from_unit"] = round(
            float(np.abs(tn - 1.0).max()), 9)
        row["flax_max_dev_from_unit"] = round(
            float(np.abs(fn_ - 1.0).max()), 9)
        row["same_distribution"] = bool(
            row["torch_max_dev_from_unit"] < 1e-5
            and row["flax_max_dev_from_unit"] < 1e-5
        )
    else:
        d, p = ks_2samp(tn, fn_)
        row["ks_stat"], row["ks_p"] = round(d, 5), round(p, 5)
        row["same_distribution"] = bool(p > 0.01)
    return row


def main():
    rows = [analyze("conv", s, torch_conv_sample, flax_conv_sample)
            for s in CONV_SHAPES]
    rows += [analyze("dense", s, torch_dense_sample, flax_dense_sample)
             for s in DENSE_SHAPES]
    verdict = all(r["same_distribution"] for r in rows)
    out = dict(
        what=("Empirical test of VERDICT r04 weak #1: torch orthogonal_ vs "
              "flax orthogonal() as DISTRIBUTIONS, per weight-shape family "
              "of the head-to-head model. KS test on per-filter norms over "
              f"{N_SAMPLES} independent inits per side per shape; Gram "
              "residual certifies which orthonormality each sampler "
              "actually delivers."),
        n_samples=dict(varying_norm_shapes=N_SAMPLES, degenerate_shapes=8),
        shapes=rows,
        identical_distributions=verdict,
        conclusion=(
            "torch and flax orthogonal inits are the SAME distribution for "
            "every shape in the model (Haar-Stiefel, invariant to the "
            "transpose/flattening-order differences the r04 verdict "
            "suspected); the matricization hypothesis for the -1.1 dB "
            "offset is eliminated analytically and empirically"
            if verdict else
            "DISTRIBUTIONS DIFFER — see per-shape rows; the init hypothesis "
            "is live and the torch-matricization init arm must be trained"
        ),
    )
    path = os.path.join(REPO, "docs", "INIT_DIST_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
