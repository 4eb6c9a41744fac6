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

Kernel structure (all four kernels): a 3-D grid whose innermost dimension
walks the streamed axis block-by-block, with the online-softmax / gradient
accumulators held in VMEM scratch that persists across the sequential grid
steps. VMEM residency is O(block * d) regardless of seq — at 16384 tokens
(the 128x128 feature map of the 64->512 model) whole-K/V-in-VMEM designs
exceed the ~16MB VMEM budget, this one does not.

Measured in-model on TPU v5e (64->512 model, bf16, max|err| vs XLA <= 1e-3;
docs/BENCH512_r05.json, round-5 kernel stack): at 1k/4k tokens (attn_res
32/64) the materialized XLA path is 1-3% faster in training and up to 26%
faster in batch-1 sampling, so the auto policy dispatches XLA below 8192
tokens; at 16384 tokens (attn_res 128) flash trains at 236.8 ms/step
(batch 1, 7% faster than XLA's 253.6) and 834.6 ms/step (batch 8) where
the materialized path fails to compile (works at batch 4: 567.2 ms) —
i.e., attention at the 128x128 feature map at batch is practical only
through this kernel, and the reference disabled attention at 512^2
entirely.

Training uses the same blockwise structure: the custom_vjp forward saves the
per-row logsumexp and the backward runs two Pallas kernels (dK/dV gridded
over k-blocks streaming q-blocks, dQ gridded over q-blocks streaming
k-blocks), so neither direction ever materializes the (seq x seq) matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_xla(q, k, v, scale):
    """Reference attention. q,k,v: (bh, seq, d). Returns (bh, seq, d) in f32."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                      scale, with_lse):
    """Online-softmax attention, one (bh, q-block, k-block) grid cell.

    The k axis (program_id 2) is innermost and sequential on TPU; acc/m/l
    scratch carries the running softmax state across k-blocks. Block refs:
    q_ref (1, block_q, d); k_ref/v_ref (1, block_k, d).
    """
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        lse_ref, (acc_ref, m_ref, l_ref) = None, rest
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(j == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if with_lse:
            # (bh, seq, 1) layout: the trailing singleton keeps loads/stores
            # 2-D (this Mosaic stack can't lane->sublane cast)
            lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _fwd_pallas_call(q, k, v, scale, block_q, block_k, with_lse, interpret):
    bh, seq, d = q.shape
    grid = (bh, seq // block_q, seq // block_k)
    qspec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    out_specs = [qspec]
    out_shape = [jax.ShapeDtypeStruct((bh, seq, d), jnp.float32)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, seq, 1), jnp.float32))
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, with_lse=with_lse),
        grid=grid,
        in_specs=[qspec, kspec, kspec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


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
    (out,) = _fwd_pallas_call(
        q, k, v, scale, block_q, block_k, with_lse=False, interpret=interpret
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def attention_flash_fwd(q, k, v, scale, block_q=256, block_k=256,
                        interpret=False):
    """Flash forward returning (out, lse) for the backward pass."""
    bh, seq, d = q.shape
    block_q = min(block_q, seq)
    block_k = min(block_k, seq)
    out, lse = _fwd_pallas_call(
        q, k, v, scale, block_q, block_k, with_lse=True, interpret=interpret
    )
    return out, lse


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dsum_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    """dK/dV for one (bh, k-block, q-block) cell: q-blocks innermost,
    probability tile recomputed from the saved logsumexp — never
    materializes the (seq x seq) matrix."""
    i = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    qi = q_ref[0].astype(jnp.float32)  # (block_q, d)
    doi = do_ref[0].astype(jnp.float32)
    li = lse_ref[0]
    di = dsum_ref[0]
    s = jax.lax.dot_general(
        qi, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    p = jnp.exp(s - li)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, doi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        doi, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dsm = p * (dp - di) * scale
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        dsm, qi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, do_ref, lse_ref, dsum_ref, k_ref, v_ref,
                         dq_ref, dq_acc, *, scale):
    """dQ for one (bh, q-block, k-block) cell: k-blocks innermost."""
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    qi = q_ref[0].astype(jnp.float32)
    doi = do_ref[0].astype(jnp.float32)
    li = lse_ref[0]
    di = dsum_ref[0]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        qi, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - li)
    dp = jax.lax.dot_general(
        doi, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dsm = p * (dp - di) * scale
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        dsm, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == n_k - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def attention_flash_bwd(q, k, v, g, lse, dsum, scale,
                        block_q=256, block_k=256, interpret=False):
    """Blockwise flash backward: (dq, dk, dv) in f32, O(block) VMEM."""
    bh, seq, d = q.shape
    block_q = min(block_q, seq)
    block_k = min(block_k, seq)

    qspec = lambda last: pl.BlockSpec(
        (1, block_q, last), lambda b, i, j: (b, i, 0)
    )
    # dK/dV grid: (bh, k-block, q-block) — q innermost
    kspec_o = pl.BlockSpec((1, block_k, d), lambda b, jk, i: (b, jk, 0))
    qspec_i = lambda last: pl.BlockSpec(
        (1, block_q, last), lambda b, jk, i: (b, i, 0)
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, seq // block_k, seq // block_q),
        in_specs=[kspec_o, kspec_o, qspec_i(d), qspec_i(d),
                  qspec_i(1), qspec_i(1)],
        out_specs=[kspec_o, kspec_o],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(k, v, q, g, lse, dsum)

    # dQ grid: (bh, q-block, k-block) — k innermost
    kspec_i = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(bh, seq // block_q, seq // block_k),
        in_specs=[qspec(d), qspec(d), qspec(1), qspec(1), kspec_i, kspec_i],
        out_specs=qspec(d),
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
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
        # threshold from the round-5 512^2 sweep (docs/BENCH512_r05.json):
        # at 1k/4k tokens XLA is 1-3% faster in training and up to 26%
        # faster in batch-1 sampling (19.0 vs 25.7 ms/step), while at 16k
        # tokens the materialized path OOMs at batch 8 — so flash engages
        # only where it is load-bearing
        use_flash = (
            seq >= 8192
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
