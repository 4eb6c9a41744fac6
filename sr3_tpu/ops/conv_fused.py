"""Fused GroupNorm -> SiLU -> Conv3x3 Pallas kernel.

The reference's hot block is GroupNorm -> Swish -> (Dropout) -> Conv3x3
(model/sr3_modules/unet.py:80-91). Under plain XLA this costs ~3 reads and
2 writes of the feature map per block (stats reduction, normalize+swish
materialization, conv). At SR3's scales the *normalized* feature map fits
VMEM whole (<= ~4.5MB), so one kernel does everything in a single HBM pass:

    DMA x row-chunks HBM->VMEM once (accumulating group stats on the fly,
    staging raw rows into a padded VMEM scratch) -> normalize+swish the
    scratch in place -> 3x3 conv as 9 shifted MXU matmuls per row chunk ->
    DMA y rows back to HBM.

HBM traffic per block drops to 1 read + 1 write of the feature map (plus
the conv kernel), which is the floor. x/y live in HBM (``pltpu.ANY``) and
are moved manually, so VMEM holds only the padded scratch + small chunk
buffers — Mosaic's automatic double-buffering of full-map blocks would
not fit the widest levels.

The kernel also accepts an optional per-(batch, channel) affine
pre-transform ``a*x + b`` applied *before* the norm — exactly the shape of
the SR3 FiLM / DDPM bias conditioning injected between the two blocks of a
ResnetBlock — which folds into the group statistics algebraically
(sum(a*x+b) = a*s1 + HW*b, etc.), so conditioning costs zero extra memory
traffic.

Backward runs through a custom_vjp whose gradient is the XLA composition
(the sampling chain — the perf headline — never calls it).
Layout NHWC / HWIO; stats in f32; matmuls accumulate in f32.

Measured on TPU v5e (batch 8, 16->128 model shapes): in ISOLATION the
kernel beats the XLA composition by 1.4-1.8x at C>=256 blocks (e.g.
32x32x256->256: 29.0us -> 20.7us; 16x16 512->512: 32.4 -> 19.4;
32x32 512->256: 34.3 -> 19.2) and loses slightly at C=128. IN-MODEL,
however, the full sampling step runs ~12% SLOWER with the kernel
dispatched (8.5-8.9 ms/step vs 7.7 XLA): each pallas_call is a fusion
barrier and Mosaic programs don't overlap with neighboring XLA ops, which
costs more than the saved traffic on a model XLA already runs at ~87% of
the HBM roofline. Hence dispatch is OPT-IN (``SR3_FUSED_CONV=1`` or
``use_pallas=True``); the XLA composition is the default. C=64 maps (the
model's widest level) are excluded either way: Mosaic cannot DMA-slice
memrefs whose last dim is under the 128-lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped VMEM is ~16MB/core; leave headroom for Mosaic's own buffers.
_VMEM_BUDGET = 12 * 1024 * 1024


def gn_silu_conv3x3_xla(x, gn_scale, gn_bias, kernel, bias, num_groups,
                        eps=1e-5, pre_scale=None, pre_bias=None,
                        conv_dtype=None):
    """Reference composition in plain XLA. x:(B,H,W,C) kernel:(3,3,C,Cout)."""
    dtype = conv_dtype or x.dtype
    if pre_scale is not None:
        x = x * pre_scale[:, None, None, :].astype(x.dtype)
    if pre_bias is not None:
        x = x + pre_bias[:, None, None, :].astype(x.dtype)
    b, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
    # one-pass sum/sumsq stats (see ops/groupnorm.py group_norm_swish_xla)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    msq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c) * gn_scale.astype(jnp.float32) \
        + gn_bias.astype(jnp.float32)
    xn = xn * jax.nn.sigmoid(xn)
    y = jax.lax.conv_general_dilated(
        xn.astype(dtype), kernel.astype(dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y.astype(x.dtype)


def _lane_pad(c):
    """Mosaic pads the lane (last) dim to 128; account for real VMEM use."""
    return max(c, 128)


def _pick_row_chunk(h, w, c, cout, itemsize):
    """Largest power-of-two row chunk whose chunk temporaries (f32 accum +
    in/out slabs) stay ~<=3MB."""
    th = h
    while th > 8:
        tmp = th * w * (_lane_pad(cout) * (4 + itemsize)
                        + _lane_pad(c) * (4 + itemsize))
        if tmp <= 3 * 1024 * 1024:
            break
        th //= 2
    return th


def vmem_bytes(h, w, c, cout, itemsize):
    cp = _lane_pad(c)
    coutp = _lane_pad(cout)
    th = _pick_row_chunk(h, w, c, cout, itemsize)
    scratch = (h + 2) * (w + 2) * cp * itemsize
    kern = 9 * c * coutp * itemsize
    in_slabs = 2 * th * w * cp * itemsize
    out_slabs = 2 * th * w * coutp * itemsize
    chunk_tmp = th * w * (coutp * 4 + cp * 4)  # f32 accum + f32 cast
    return scratch + kern + in_slabs + out_slabs + chunk_tmp


def _kernel(x_hbm, pa_ref, pb_ref, gs_ref, gb_ref, k_ref, cb_ref, res_hbm,
            o_hbm, pad_ref, in_slab, out_slab, res_slab, in_sem, out_sem,
            res_sem, *, num_groups, eps, th, out_dtype, has_res):
    """One batch element per grid step. x_hbm/o_hbm stay in HBM; row chunks
    of ``th`` rows move through the slab buffers.

    pad_ref: (H+2, W+2, C) VMEM scratch — raw x staged into the interior in
    pass 1, normalized+swished in place in pass 2, read with halo shifts by
    the conv matmuls in pass 3.
    """
    n = pl.program_id(0)
    h, w, c = x_hbm.shape[1], x_hbm.shape[2], x_hbm.shape[3]
    cout = o_hbm.shape[3]
    cg = c // num_groups
    n_chunks = h // th

    pa = pa_ref[0, 0].astype(jnp.float32)  # (C,)
    pb = pb_ref[0, 0].astype(jnp.float32)

    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)

    def start_in(i, slot):
        pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * th, th)], in_slab.at[slot], in_sem.at[slot]
        ).start()

    # ---- pass 1: DMA x rows in (once), stage raw into scratch, accumulate.
    # Double-buffered: chunk i+1's DMA overlaps chunk i's stats/staging.
    start_in(0, 0)

    def stage_body(i, carry):
        s1, s2 = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            start_in(i + 1, jax.lax.rem(i + 1, 2))

        pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * th, th)], in_slab.at[slot],
            in_sem.at[slot]
        ).wait()
        rows = in_slab[slot]
        pad_ref[pl.ds(1 + i * th, th), 1:w + 1, :] = rows.astype(pad_ref.dtype)
        xf = rows.astype(jnp.float32)
        return (s1 + jnp.sum(xf, axis=(0, 1)).reshape(1, c),
                s2 + jnp.sum(xf * xf, axis=(0, 1)).reshape(1, c))

    s1 = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, stage_body, (s1, s2))

    # fold the pre-affine a*x+b into the raw sums (per channel):
    #   sum(a x + b) = a s1 + HW b;  sum((a x + b)^2) = a^2 s2 + 2ab s1 + HW b^2
    n_hw = jnp.float32(h * w)
    s1p = pa * s1 + n_hw * pb
    s2p = pa * pa * s2 + 2.0 * pa * pb * s1 + n_hw * pb * pb

    # fold channels into groups with a (C,G) indicator matmul (the lane dim
    # cannot be reshape-folded into sublanes on TPU)
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    cmask = (chan // cg == grp).astype(jnp.float32)
    g1 = jnp.dot(s1p, cmask, preferred_element_type=jnp.float32)
    g2 = jnp.dot(s2p, cmask, preferred_element_type=jnp.float32)
    n_g = jnp.float32(h * w * cg)
    mean_g = g1 / n_g
    var_g = g2 / n_g - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, cmask.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, cmask.T, preferred_element_type=jnp.float32)

    # normalized value of (a x + b):  ((a x + b) - mean)*rstd*scale + bias
    #   = x * (a*rstd*scale) + ((b - mean)*rstd*scale + bias)
    sc = gs_ref[0, 0].astype(jnp.float32) * rstd_c[0]
    mult = (pa * sc).reshape(1, 1, c)
    add = ((pb - mean_c[0]) * sc + gb_ref[0, 0].astype(jnp.float32)).reshape(
        1, 1, c)

    # ---- pass 2: normalize + swish the scratch interior in place
    def norm_body(i, _):
        y = pad_ref[pl.ds(1 + i * th, th), 1:w + 1, :].astype(jnp.float32)
        y = y * mult + add
        y = y * jax.nn.sigmoid(y)
        pad_ref[pl.ds(1 + i * th, th), 1:w + 1, :] = y.astype(pad_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)

    # ---- pass 3: conv as 9 shifted matmuls per row chunk, DMA rows out
    cbias = cb_ref[0, 0].astype(jnp.float32).reshape(1, cout)

    # Double-buffered stores: chunk i's DMA-out overlaps chunk i+1's matmuls.
    def conv_body(i, _):
        r0 = i * th
        slot = jax.lax.rem(i, 2)
        if has_res:
            # fetch the residual rows while the matmuls run
            res_dma = pltpu.make_async_copy(
                res_hbm.at[n, pl.ds(r0, th)], res_slab, res_sem
            )
            res_dma.start()
        acc = jnp.zeros((th * w, cout), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                slab = pad_ref[pl.ds(r0 + dh, th), dw:dw + w, :]
                acc = acc + jax.lax.dot_general(
                    slab.reshape(th * w, c), k_ref[dh, dw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(i >= 2)
        def _():  # slot free only once its previous store completed
            pltpu.make_async_copy(
                out_slab.at[slot], o_hbm.at[n, pl.ds((i - 2) * th, th)],
                out_sem.at[slot]
            ).wait()

        y = acc + cbias
        if has_res:
            res_dma.wait()
            y = y + res_slab[:].reshape(th * w, cout).astype(jnp.float32)
        out_slab[slot] = y.reshape(th, w, cout).astype(out_dtype)
        pltpu.make_async_copy(
            out_slab.at[slot], o_hbm.at[n, pl.ds(r0, th)], out_sem.at[slot]
        ).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, conv_body, 0)

    # drain the last (up to) two in-flight stores
    for j in range(2):
        i_last = n_chunks - 1 - j
        if i_last >= 0:
            slot = i_last % 2
            pltpu.make_async_copy(
                out_slab.at[slot], o_hbm.at[n, pl.ds(i_last * th, th)],
                out_sem.at[slot]
            ).wait()


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "interpret")
)
def _gn_silu_conv3x3_pallas(x, pre_scale, pre_bias, gn_scale, gn_bias,
                            kernel, bias, residual, num_groups, eps=1e-5,
                            interpret=False):
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    th = _pick_row_chunk(h, w, c, cout, x.dtype.itemsize)
    has_res = residual is not None
    if not has_res:
        # zero-size placeholder; the kernel never touches it
        residual = jnp.zeros((b, th, w, cout), x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, eps=eps, th=th,
            out_dtype=x.dtype, has_res=has_res,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, 3, c, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # residual stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),  # y stays in HBM
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), x.dtype),   # padded normalized map
            pltpu.VMEM((2, th, w, c), x.dtype),       # double-buffered in slabs
            pltpu.VMEM((2, th, w, cout), x.dtype),    # double-buffered out slabs
            pltpu.VMEM((th, w, cout), x.dtype),       # residual slab
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, pre_scale.reshape(b, 1, c), pre_bias.reshape(b, 1, c),
      gn_scale.reshape(1, 1, c), gn_bias.reshape(1, 1, c),
      kernel.astype(x.dtype), bias.reshape(1, 1, cout),
      residual.astype(x.dtype))
    return out


@functools.lru_cache(maxsize=None)
def _fused_fwd_bwd(num_groups, eps, interpret, has_res):
    """custom_vjp: Pallas single-HBM-pass forward, XLA backward (the
    backward feeds conv grads XLA fuses well; sampling never calls it)."""

    @jax.custom_vjp
    def f(x, ps, pb, gs, gb, k, cb, r):
        return _gn_silu_conv3x3_pallas(
            x, ps, pb, gs, gb, k, cb, r if has_res else None,
            num_groups, eps=eps, interpret=interpret,
        )

    def fwd(x, ps, pb, gs, gb, k, cb, r):
        return f(x, ps, pb, gs, gb, k, cb, r), (x, ps, pb, gs, gb, k, cb, r)

    def bwd(res, g):
        x, ps, pb, gs, gb, k, cb, r = res
        _, vjp = jax.vjp(
            lambda x_, ps_, pb_, gs_, gb_, k_, cb_: gn_silu_conv3x3_xla(
                x_, gs_, gb_, k_, cb_, num_groups, eps=eps,
                pre_scale=ps_, pre_bias=pb_,
            ),
            x, ps, pb, gs, gb, k, cb,
        )
        return vjp(g) + (g.astype(r.dtype) if has_res
                         else jnp.zeros_like(r),)

    f.defvjp(fwd, bwd)
    return f


def fusable(x_shape, cout, num_groups, dtype):
    """Can the Pallas kernel handle this block shape within VMEM?

    Channel counts must be multiples of the 128-lane tile: Mosaic cannot
    DMA-slice memrefs whose last dim is below/off the tile (observed:
    "Slice shape along dimension 3 must be aligned to tiling (128)"), so
    C=64 maps (the model's first level) stay on XLA.
    """
    b, h, w, c = x_shape
    if c % num_groups or h < 8 or (h & (h - 1)):
        return False
    if c % 128 or cout % 128:
        return False
    return vmem_bytes(h, w, c, cout, jnp.dtype(dtype).itemsize) \
        <= _VMEM_BUDGET


def gn_silu_conv3x3(x, gn_scale, gn_bias, kernel, bias, num_groups,
                    eps=1e-5, pre_scale=None, pre_bias=None, residual=None,
                    use_pallas=None, interpret=False):
    """GroupNorm+SiLU+Conv3x3 (+ optional pre-affine conditioning fold
    and fused residual add).

    ``pre_scale``/``pre_bias``: optional (B, C) per-sample affine applied to
    x before the norm — the FiLM / bias conditioning of a ResnetBlock.
    ``residual``: optional (B, H, W, Cout) tensor added to the conv output
    inside the kernel (the ResnetBlock skip), saving its separate
    read-add-write pass. Dispatches to the single-HBM-pass Pallas kernel
    on TPU when the block fits VMEM; XLA composition otherwise.
    """
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and fusable(x.shape, cout, num_groups, x.dtype)
        )
    if not use_pallas:
        out = gn_silu_conv3x3_xla(
            x, gn_scale, gn_bias, kernel, bias, num_groups, eps=eps,
            pre_scale=pre_scale, pre_bias=pre_bias,
        )
        return out + residual.astype(out.dtype) if residual is not None \
            else out
    ps = jnp.ones((b, c), jnp.float32) if pre_scale is None \
        else pre_scale.astype(jnp.float32)
    pb = jnp.zeros((b, c), jnp.float32) if pre_bias is None \
        else pre_bias.astype(jnp.float32)
    cb = jnp.zeros((cout,), jnp.float32) if bias is None \
        else bias.astype(jnp.float32)
    has_res = residual is not None
    r = residual if has_res else jnp.zeros((1,) * 4, x.dtype)
    return _fused_fwd_bwd(num_groups, eps, interpret, has_res)(
        x, ps, pb, gn_scale.astype(jnp.float32),
        gn_bias.astype(jnp.float32), kernel, cb, r,
    )
