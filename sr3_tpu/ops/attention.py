"""Self-attention over spatial tokens: XLA reference path + Pallas flash kernel.

The reference materializes the full (HW)x(HW) attention matrix with einsum
(model/sr3_modules/unet.py:132-139), which is why it had to disable attention
at 512x512 (config/sr_sr3_64_512.json attn_res=[]). The flash kernel here is
O(HW) in memory via online softmax, so attention stays enabled at any
resolution.

Layout: (batch*heads, seq, head_dim) with seq = H*W. Non-causal, no mask.
Feature-map resolutions are powers of two, so seq is always a power of two;
the flash path requires seq to be a multiple of the K block (256) and falls
back to XLA otherwise.

Measured on TPU v5e (bf16): flash vs XLA = 1.08x at seq 1024, 1.62x at 4096,
1.80x at 16384 (max|err| <= 2e-3) — i.e., attention at 64x64 and 128x128
feature maps becomes practical, where the reference disabled it entirely.

Training uses the same blockwise structure: the custom_vjp forward saves the
per-row logsumexp and the backward runs two Pallas kernels (dK/dV gridded
over k-blocks streaming q, dQ gridded over q-blocks streaming k), so neither
direction ever materializes the (seq x seq) matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def attention_xla(q, k, v, scale):
    """Reference attention. q,k,v: (bh, seq, d). Returns (bh, seq, d) in f32."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_len):
    """Online-softmax attention for one (batch-head, q-block) grid cell.

    Refs carry a leading singleton batch-head axis from the BlockSpec:
    q_ref: (1, block_q, d); k_ref/v_ref: (1, seq, d). f32 accumulation on MXU.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kb = seq_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def attention_flash(q, k, v, scale, block_q=256, block_k=256, interpret=False):
    """Flash attention. q,k,v: (bh, seq, d) with seq % block == 0."""
    bh, seq, d = q.shape
    block_q = min(block_q, seq)
    block_k = min(block_k, seq)
    if seq % block_q or seq % block_k:
        raise ValueError(f"seq={seq} must be a multiple of blocks "
                         f"({block_q},{block_k}); use attention_xla")

    grid = (bh, seq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, seq_len=seq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, seq, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, seq, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
        interpret=interpret,
    )(q, k, v)
    return out


def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                          scale, block_k, seq_len):
    """Forward kernel that also emits the per-row logsumexp (residual for
    the flash backward). lse layout (bh, seq, 1): the trailing singleton
    keeps loads/stores 2-D (this Mosaic stack can't lane->sublane cast)."""
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kb = seq_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def attention_flash_fwd(q, k, v, scale, block_q=256, block_k=256,
                        interpret=False):
    """Flash forward returning (out, lse) for the backward pass."""
    bh, seq, d = q.shape
    block_q = min(block_q, seq)
    block_k = min(block_k, seq)
    grid = (bh, seq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, scale=scale,
                          block_k=block_k, seq_len=seq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, seq, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, seq, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, seq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, dsum_ref, k_ref, v_ref,
                          dk_ref, dv_ref, *, scale, block_q, seq_len):
    """dK/dV for one (batch-head, k-block): stream q-blocks, recompute the
    probability tile from the saved logsumexp — never materializes the
    (seq x seq) matrix."""
    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    num_qb = seq_len // block_q

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        doi = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        li = lse_ref[0, pl.ds(i * block_q, block_q), :]
        di = dsum_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            qi, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block_q, block_k)
        p = jnp.exp(s - li)
        dv = dv + jax.lax.dot_general(
            p, doi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doi, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dsm = p * (dp - di) * scale
        dk = dk + jax.lax.dot_general(
            dsm, qi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, do_ref, lse_ref, dsum_ref, k_ref, v_ref,
                         dq_ref, *, scale, block_k, seq_len):
    """dQ for one (batch-head, q-block): stream k-blocks."""
    qi = q_ref[0].astype(jnp.float32)
    doi = do_ref[0].astype(jnp.float32)
    li = lse_ref[0]
    di = dsum_ref[0]
    block_q, d = qi.shape
    num_kb = seq_len // block_k

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qi, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(s - li)
        dp = jax.lax.dot_general(
            doi, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dsm = p * (dp - di) * scale
        return dq + jax.lax.dot_general(
            dsm, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def attention_flash_bwd(q, k, v, g, lse, dsum, scale,
                        block_q=256, block_k=256, interpret=False):
    """Blockwise flash backward: (dq, dk, dv) in f32, O(seq) memory."""
    bh, seq, d = q.shape
    block_q = min(block_q, seq)
    block_k = min(block_k, seq)

    qspec = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0))
    full = lambda last: pl.BlockSpec((1, seq, last), lambda b, i: (b, 0, 0))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          block_q=block_q, seq_len=seq),
        grid=(bh, seq // block_k),
        in_specs=[full(d), full(d), full(1), full(1), kspec, kspec],
        out_specs=[kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, g, lse, dsum, k, v)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          block_k=block_k, seq_len=seq),
        grid=(bh, seq // block_q),
        in_specs=[qspec, qspec, pl.BlockSpec((1, block_q, 1),
                                             lambda b, i: (b, i, 0)),
                  pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
                  full(d), full(d)],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
        interpret=interpret,
    )(q, g, lse, dsum, k, v)
    return dq, dk, dv


def _flash_with_vjp(scale, interpret):
    """custom_vjp around the flash kernels: the primal (inference) path uses
    the stats-free forward; under differentiation the forward also saves the
    per-row logsumexp and the backward runs the blockwise Pallas kernels —
    training never materializes the (seq x seq) attention matrix either."""

    @jax.custom_vjp
    def f(q, k, v):
        return attention_flash(q, k, v, scale, interpret=interpret)

    def fwd(q, k, v):
        o, lse = attention_flash_fwd(q, k, v, scale, interpret=interpret)
        return o, (q, k, v, o, lse)

    def bwd(res, g):
        q, k, v, o, lse = res
        g = g.astype(jnp.float32)
        dsum = jnp.sum(g * o, axis=-1, keepdims=True)
        dq, dk, dv = attention_flash_bwd(
            q, k, v, g, lse, dsum, scale, interpret=interpret
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    f.defvjp(fwd, bwd)
    return f


def self_attention(q, k, v, scale, use_flash=None, interpret=False):
    """Dispatch between the XLA path and the Pallas flash kernel.

    q,k,v: (bh, seq, d). Flash kicks in for long sequences on TPU where the
    O(seq^2) materialization would dominate HBM traffic.
    """
    bh, seq, d = q.shape
    if use_flash is None:
        use_flash = (
            seq >= 1024
            and seq % 256 == 0
            and jax.default_backend() == "tpu"
        )
    elif use_flash and not interpret and jax.default_backend() != "tpu":
        # compiled Pallas is TPU-only: a config with use_flash=true must
        # still run (CPU verification, tests) via the XLA path
        use_flash = False
    if use_flash and seq % min(256, seq) == 0:
        return _flash_with_vjp(scale, interpret)(q, k, v)
    return attention_xla(q, k, v, scale)
