"""Pallas kernels (interpret mode on CPU) vs XLA reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3_tpu.ops.attention import attention_flash, attention_xla
from sr3_tpu.ops.groupnorm import group_norm_swish_pallas, group_norm_swish_xla


@pytest.mark.parametrize("seq,d", [(256, 64), (512, 128)])
def test_flash_attention_matches_xla(rng, seq, d):
    q = jnp.asarray(rng.standard_normal((2, seq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, seq, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, seq, d), dtype=np.float32))
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(q, k, v, scale)
    out = attention_flash(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_rejects_ragged_seq():
    q = jnp.zeros((1, 300, 64))
    with pytest.raises(ValueError):
        attention_flash(q, q, q, 1.0, interpret=True)


@pytest.mark.quick
@pytest.mark.parametrize("seq,expect_flash", [
    (1024, False), (4096, False),   # XLA measurably faster here (r05 sweep)
    (8192, True), (16384, True),    # flash load-bearing (XLA OOMs at b8)
])
def test_auto_dispatch_threshold(monkeypatch, seq, expect_flash):
    """The use_flash=None policy boundary pinned by docs/BENCH512_r05.json."""
    from sr3_tpu.ops import attention as A

    calls = []
    monkeypatch.setattr(A, "attention_xla",
                        lambda *a, **k: calls.append("xla"))
    monkeypatch.setattr(A, "_flash_with_vjp",
                        lambda *a, **k: lambda q, kk, v: calls.append("flash"))
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    A.self_attention(jnp.zeros((1, seq, 8)), jnp.zeros((1, seq, 8)),
                     jnp.zeros((1, seq, 8)), 1.0, use_flash=None)
    assert calls == (["flash"] if expect_flash else ["xla"])


@pytest.mark.parametrize("groups,c", [(32, 128), (8, 256), (4, 128)])
def test_group_norm_pallas_matches_xla(rng, groups, c):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c), dtype=np.float32))
    scale = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    ref = group_norm_swish_xla(x, scale, bias, groups)
    out = group_norm_swish_pallas(x, scale, bias, groups, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_group_norm_no_swish(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 128), dtype=np.float32))
    s = jnp.ones(128)
    b = jnp.zeros(128)
    out = group_norm_swish_pallas(x, s, b, 32, swish=False, interpret=True)
    ref = group_norm_swish_xla(x, s, b, 32, swish=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # normalized: per-group mean ~0
    assert abs(float(jnp.mean(out))) < 0.2


def test_group_norm_torch_parity(rng):
    torch = pytest.importorskip("torch")
    c, groups = 64, 8
    x = rng.standard_normal((2, 6, 5, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)

    gn = torch.nn.GroupNorm(groups, c)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref = gn(xt)
        ref = (ref * torch.sigmoid(ref)).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    out = group_norm_swish_xla(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), groups
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_group_norm_pallas_vjp_matches_xla(rng):
    """The custom VJP on the Pallas path must match XLA autodiff exactly."""
    from sr3_tpu.ops.groupnorm import group_norm_swish

    x = jnp.asarray(rng.standard_normal((2, 4, 4, 128), dtype=np.float32))
    s = jnp.asarray(rng.standard_normal(128, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(128, dtype=np.float32))

    def loss_pallas(x, s, b):
        return jnp.sum(
            group_norm_swish(x, s, b, 32, use_pallas=True, interpret=True) ** 2
        )

    def loss_xla(x, s, b):
        return jnp.sum(group_norm_swish(x, s, b, 32, use_pallas=False) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, s, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, s, b)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-4)


def test_group_norm_pallas_vjp_no_swish(rng):
    from sr3_tpu.ops.groupnorm import group_norm_swish

    x = jnp.asarray(rng.standard_normal((1, 4, 4, 128), dtype=np.float32))
    s = jnp.ones(128)
    b = jnp.zeros(128)
    gp = jax.grad(
        lambda x: jnp.sum(
            group_norm_swish(x, s, b, 32, swish=False, use_pallas=True,
                             interpret=True) ** 2
        )
    )(x)
    gx = jax.grad(
        lambda x: jnp.sum(
            group_norm_swish(x, s, b, 32, swish=False, use_pallas=False) ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-3)


@pytest.mark.parametrize("groups,c,swish", [(16, 64, True), (8, 128, False)])
def test_group_norm_stats_kernel_matches_xla(rng, groups, c, swish):
    """The stats-only Pallas path (one-HBM-pass sum/sumsq + XLA normalize;
    opt-in via SR3_PALLAS_GN_STATS=1 — it measured slower than XLA's
    one-pass fusion on v5e, docs/GNEXP_r03.txt) matches the XLA reference
    fwd+bwd."""
    from sr3_tpu.ops.groupnorm import _gn_swish_stats_fwd_bwd

    x = jnp.asarray(rng.standard_normal((2, 16, 8, c), dtype=np.float32)) + 0.2
    s = jnp.asarray(rng.standard_normal(c, dtype=np.float32)) * 0.1 + 1.0
    b = jnp.asarray(rng.standard_normal(c, dtype=np.float32)) * 0.1
    f = _gn_swish_stats_fwd_bwd(groups, 1e-5, swish, True)
    ref = group_norm_swish_xla(x, s, b, groups, swish=swish)
    np.testing.assert_allclose(
        np.asarray(f(x, s, b)), np.asarray(ref), atol=1e-5)
    gp = jax.grad(
        lambda a, sc, bi: jnp.sum(f(a, sc, bi) ** 2), argnums=(0, 1, 2)
    )(x, s, b)
    gx = jax.grad(
        lambda a, sc, bi: jnp.sum(
            group_norm_swish_xla(a, sc, bi, groups, swish=swish) ** 2),
        argnums=(0, 1, 2),
    )(x, s, b)
    for p, q in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=2e-3)


def test_group_norm_stats_kernel_accumulates_blocks(rng, monkeypatch):
    """H larger than one VMEM block: grid accumulation must cover all rows."""
    from sr3_tpu.ops import groupnorm

    x = jnp.asarray(rng.standard_normal((1, 64, 4, 128), dtype=np.float32))
    monkeypatch.setattr(groupnorm, "_STATS_BLOCK_BYTES", 16 * 1024)
    assert groupnorm._stats_block_h(64, 4, 1, 128, 4) == 8
    s1, s2 = groupnorm.gn_stats_pallas(x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(jnp.sum(x, axis=(1, 2))), rtol=1e-5,
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(jnp.sum(x * x, axis=(1, 2))), rtol=1e-5,
        atol=1e-4)


def test_flash_attention_vjp_matches_xla(rng):
    from sr3_tpu.ops.attention import self_attention

    q = jnp.asarray(rng.standard_normal((2, 256, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 256, 64), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 256, 64), dtype=np.float32))
    scale = 1.0 / 8.0

    def loss_flash(q, k, v):
        return jnp.sum(
            self_attention(q, k, v, scale, use_flash=True, interpret=True) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(self_attention(q, k, v, scale, use_flash=False) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)


def test_flash_attention_fwd_lse(rng):
    from sr3_tpu.ops.attention import attention_flash_fwd

    q = jnp.asarray(rng.standard_normal((2, 512, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 512, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 512, 32), dtype=np.float32))
    scale = 0.17
    out, lse = attention_flash_fwd(q, k, v, scale, block_q=256, block_k=256,
                                   interpret=True)
    ref = attention_xla(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    logits = np.einsum("bqd,bkd->bqk", q, k) * scale
    ref_lse = np.log(np.exp(logits).sum(-1))[..., None]
    np.testing.assert_allclose(np.asarray(lse), ref_lse, atol=1e-4, rtol=1e-5)


def test_flash_attention_vjp_multiblock(rng):
    """Blockwise Pallas backward across multiple q/k blocks (seq 512,
    block 256) must match the XLA gradients."""
    from sr3_tpu.ops.attention import self_attention

    q = jnp.asarray(rng.standard_normal((1, 512, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 512, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 512, 32), dtype=np.float32))
    scale = 1.0 / np.sqrt(32)

    gf = jax.grad(
        lambda q, k, v: jnp.sum(
            self_attention(q, k, v, scale, use_flash=True, interpret=True)
            ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: jnp.sum(
            self_attention(q, k, v, scale, use_flash=False) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, r in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)


# ---- dropout with backward-pass mask recompute (ops/dropout.py) ------------

@pytest.mark.quick
def test_dropout_recompute_bitidentical_to_stored(rng):
    """Same key -> same mask -> bit-identical outputs AND gradients between
    the save-the-mask and recompute-in-backward implementations: the HBM
    optimization is semantics-free (VERDICT r04 #3)."""
    from sr3_tpu.ops.dropout import dropout_recompute, dropout_stored

    x = jnp.asarray(rng.standard_normal((4, 16, 16, 32), dtype=np.float32))
    key = jax.random.PRNGKey(17)
    rate = 0.2

    y_stored = dropout_stored(x, key, rate)
    y_rec = dropout_recompute(x, key, rate)
    np.testing.assert_array_equal(np.asarray(y_stored), np.asarray(y_rec))

    # gradients through a nonlinear reduction must match bit-for-bit
    f_stored = jax.grad(lambda a: jnp.sum(jnp.tanh(dropout_stored(a, key, rate))))
    f_rec = jax.grad(lambda a: jnp.sum(jnp.tanh(dropout_recompute(a, key, rate))))
    np.testing.assert_array_equal(np.asarray(f_stored(x)), np.asarray(f_rec(x)))


@pytest.mark.quick
def test_dropout_semantics(rng):
    """Inverted scaling (x/keep where kept, 0 elsewhere), rate-0 passthrough,
    bf16 dtype preservation — matching flax nn.Dropout / torch nn.Dropout
    (reference sr3_modules/unet.py:80-91 applies it between swish and conv)."""
    from sr3_tpu.ops.dropout import dropout

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64), dtype=np.float32)) + 5.0
    key = jax.random.PRNGKey(3)
    y = dropout(x, key, 0.2)
    kept = np.asarray(y) != 0.0
    np.testing.assert_allclose(np.asarray(y)[kept],
                               (np.asarray(x) / 0.8)[kept], rtol=1e-6)
    assert 0.6 < kept.mean() < 0.95  # keep fraction ~0.8
    assert dropout(x, key, 0.0) is x  # rate 0: no-op, no mask drawn

    xb = x.astype(jnp.bfloat16)
    assert dropout(xb, key, 0.2).dtype == jnp.bfloat16


@pytest.mark.quick
def test_unet_block_dropout_paths_match(rng, monkeypatch):
    """The UNet Block's training path produces identical loss and gradients
    under SR3_DROPOUT_STORED=1 and the default recompute path (same rngs)."""
    import os

    from sr3_tpu.models.unet import Block

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16), dtype=np.float32))
    blk = Block(dim_out=16, groups=4, dropout=0.3)
    params = blk.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )

    def loss(p, stored):
        if stored:
            monkeypatch.setenv("SR3_DROPOUT_STORED", "1")
        else:
            monkeypatch.delenv("SR3_DROPOUT_STORED", raising=False)
        out = blk.apply(p, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(9)})
        return jnp.sum(out ** 2)

    l_rec, g_rec = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_sto, g_sto = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert float(l_rec) == float(l_sto)
    for a, b in zip(jax.tree_util.tree_leaves(g_rec),
                    jax.tree_util.tree_leaves(g_sto)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
