"""Fused ResNet stem Pallas kernel — kept as a measured NEGATIVE result.

The ImageNet stem complex (quantize -> space-to-depth -> 4x4 conv ->
requant/ReLU -> 3x3/s2 maxpool) is the single largest block of the
INT8 ResNet-18 forward (~34% of device time under XLA: the conv writes
the full [N,112,112,64] pre-pool activation to HBM — 205 MB at batch
256 — and the pool immediately reads it back).  This kernel keeps that
intermediate in VMEM: per grid step it computes one row band of one
image's stem conv as an im2col GEMM on the MXU (K = 4*4*16 = 256,
exactly two MXU passes) and row-max-pools the raw int32 accumulators
in-register, writing only the row-pooled int8 slab.

VERDICT (measured on v5e, batch 256): the fusion LOSES to XLA by ~7x —
kernel 7.1 ms + 6.4 ms of XLA band/pad staging vs 2.1 ms for the plain
quantize/s2d/conv/pool pipeline.  Two costs the roofline sketch missed:
(1) the channel-minor [.., 16]-lane int8 blocks are tile-padded 16->128
lanes in VMEM, so the input DMA and every patch store move ~8x the
payload; (2) the 16 im2col scratch stores are serial VPU relayouts that
cannot overlap the MXU.  XLA's native conv emitter streams the sliding
window straight into the MXU without materializing patches and wins.
The op stays because it is the reference's im2col lowering
(golden_models.cpp:801,883) realized as a Pallas kernel, bit-exact and
tested; models default to the XLA path (models/resnet18.make_forward).

Reference lineage: the conv-as-GEMM lowering is the reference's im2col
path (hw/sim/cpp/src/golden_models.cpp:801,883); the fused
ReLU->requant->saturate epilogue is output_accumulator.sv's pipeline;
int32 accumulation order inside one output is associative, and every
epilogue stage is monotone non-decreasing, so max-pooling accumulators
before the epilogue is bit-exact vs conv2d_int8 + maxpool2d_int8
(tested).

Mosaic constraints that shaped the kernel (v5e, jax 0.8):
- im2col assembly goes through a VMEM scratch ref: concatenating the 16
  shifted slices directly fails to lower (slice offsets in the tile
  layouts), while stores relayout canonically;
- parity extraction (pool row split) must be a dim-0 reshape — sublane
  splits like [56,112,64]->[56,56,2,64] are unsupported shape casts, so
  the column half of the pool stays outside the kernel;
- int8 vector max does not legalize; pooling in int32 sidesteps it;
- row bands overlap by 2 conv rows, which BlockSpecs cannot express, so
  XLA materializes a banded copy of the (53 MB) s2d input instead of
  the kernel DMA-ing overlapping windows by hand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnet_accel_tpu.ops.conv import stem_s2d_weights
from resnet_accel_tpu.ops.epilogue import quantize_input

#: s2d stem geometry (7x7/s2/p3 on even H,W): 4x4/s1 conv on 12 channels.
_K = 4
_C_S2D = 12
_C_PAD = 16  # lane-aligned channel count inside the kernel
_I32_MIN = -(2 ** 31)


def _im2col(xp, patch_ref, rows: int, wo: int):
    """xp [rows+3, wo+3, 16] -> patch_ref [rows, wo, 256], K=(kh, kw, c16)."""
    for idx, (kh, kw) in enumerate(
            (kh, kw) for kh in range(_K) for kw in range(_K)):
        patch_ref[:, :, idx * _C_PAD:(idx + 1) * _C_PAD] = \
            xp[kh:kh + rows, kw:kw + wo, :]
    return patch_ref[:].reshape(rows * wo, _K * _K * _C_PAD)


def _epilogue(acc, bias_ref, fct_ref, relu: bool):
    acc = acc + bias_ref[:].astype(jnp.int32)
    if relu:
        acc = jnp.maximum(acc, 0)
    scaled = acc.astype(jnp.float32) * fct_ref[:]
    return jnp.clip(jnp.rint(scaled), -128, 127).astype(jnp.int8)


def _stem_pool_kernel(x_ref, w_ref, bias_ref, fct_ref, o_ref, patch_ref, *,
                      hb: int, wo: int, relu: bool):
    """One row band: im2col GEMM + int32 row maxpool + epilogue.

    x_ref: [1, 1, hb+3, wo+3, 16] int8 (band of the padded s2d image;
        its first two rows belong to the band above — zeros for band 0)
    w_ref: [256, O] int8, K order (kh, kw, c16)
    patch_ref: [hb, wo, 256] int8 VMEM scratch (im2col buffer)
    o_ref: [1, hb//2 - 1, wo, O] int8 (row-pooled band)
    """
    j = pl.program_id(1)
    patches = _im2col(x_ref[0, 0], patch_ref, hb, wo)

    acc = jax.lax.dot_general(
        patches, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # [hb*wo, O]
    C_out = acc.shape[-1]

    # Row half of the 3x3/s2/p1 maxpool (window rows {2r-1, 2r, 2r+1})
    # on the RAW accumulators: bias/ReLU/positive-scale/rint/clip are
    # all monotone and spatially uniform, so max commutes bit-exactly.
    # Band conv rows start 2 rows above the band's pool window, so pool
    # row r maps to row-pairs (r+1) [even, odd] and r [odd] — no fill
    # except band 0, whose first odd row was computed from the zero pad
    # and must lose every max.
    r2 = acc.reshape(hb // 2, 2, wo, C_out)
    ye, yo = r2[1:, 0], r2[1:, 1]
    yo_up = r2[:-1, 1]
    fill = jnp.full((1, wo, C_out), _I32_MIN, jnp.int32)
    yo_up_band0 = jnp.concatenate([fill, r2[1:-1, 1]], axis=0)
    yo_up = jnp.where(j == 0, yo_up_band0, yo_up)
    v = jnp.maximum(jnp.maximum(ye, yo), yo_up)         # [hb/2-1, wo, C]

    o_ref[0] = _epilogue(v, bias_ref, fct_ref, relu)


def _stem_kernel(x_ref, w_ref, bias_ref, fct_ref, o_ref, patch_ref, *,
                 ho: int, wo: int, relu: bool):
    """One full image, no pooling: im2col GEMM + epilogue."""
    patches = _im2col(x_ref[0], patch_ref, ho, wo)
    acc = jax.lax.dot_general(
        patches, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc.reshape(ho, wo, acc.shape[-1])
    o_ref[0] = _epilogue(acc, bias_ref, fct_ref, relu)


def stem_gemm_weights(weight2d: jnp.ndarray, in_c: int,
                      kernel: int) -> jnp.ndarray:
    """[O, in_c*k*k] stem weight -> [K*K*16, O] GEMM operand.

    Reorders stem_s2d_weights' (c12, kh, kw) K-order to the kernel's
    (kh, kw, c16) and zero-pads channels 12->16.
    """
    w = stem_s2d_weights(weight2d, in_c, kernel)        # [O, 12*4*4]
    O = w.shape[0]
    c12 = in_c * 4
    w = w.reshape(O, c12, _K, _K).transpose(2, 3, 1, 0)  # [kh, kw, c12, O]
    w = jnp.pad(w, ((0, 0), (0, 0), (0, _C_PAD - c12), (0, 0)))
    return w.reshape(_K * _K * _C_PAD, O)


def space_to_depth_nhwc_from_nchw(q: jnp.ndarray) -> jnp.ndarray:
    """int8 [N, C, H, W] -> channel-minor s2d [N, H/2, W/2, C*4].

    Channel order (c, row-parity, col-parity), matching
    stem_s2d_weights.
    """
    N, C, H, W = q.shape
    s = q.reshape(N, C, H // 2, 2, W // 2, 2)
    s = s.transpose(0, 2, 4, 1, 3, 5)
    return s.reshape(N, H // 2, W // 2, C * 4)


@functools.partial(
    jax.jit, static_argnames=("relu", "interpret"))
def _fused_stem_pool_call(xbands, w_gemm, bias, factors, *,
                          relu: bool, interpret: bool):
    N, B, HB, WP, CP = xbands.shape
    hb, wo = HB - 3, WP - 3
    prb = hb // 2 - 1  # pool rows per band
    O = w_gemm.shape[1]
    kernel = functools.partial(
        _stem_pool_kernel, hb=hb, wo=wo, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(N, B),
        in_specs=[
            pl.BlockSpec((1, 1, HB, WP, CP), lambda n, j: (n, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K * _K * _C_PAD, O), lambda n, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda n, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda n, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, prb, wo, O), lambda n, j: (n, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, prb * B, wo, O), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((hb, wo, _K * _K * _C_PAD), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * B * hb * wo * _K * _K * _C_PAD * O,
            bytes_accessed=N * B * (HB * WP * CP + prb * wo * O),
            transcendentals=0),
        interpret=interpret,
    )(xbands, w_gemm, bias, factors)


@functools.partial(
    jax.jit, static_argnames=("relu", "interpret"))
def _fused_stem_call(xs2d_pad, w_gemm, bias, factors, *,
                     relu: bool, interpret: bool):
    N, HP, WP, CP = xs2d_pad.shape
    ho, wo = HP - 3, WP - 3
    O = w_gemm.shape[1]
    kernel = functools.partial(_stem_kernel, ho=ho, wo=wo, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, HP, WP, CP), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K * _K * _C_PAD, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, O), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, ho, wo, O), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ho, wo, _K * _K * _C_PAD), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * ho * wo * _K * _K * _C_PAD * O,
            bytes_accessed=N * (HP * WP * CP + ho * wo * O),
            transcendentals=0),
        interpret=interpret,
    )(xs2d_pad, w_gemm, bias, factors)


def fused_stem_pool(
    x: jnp.ndarray,
    weight2d: jnp.ndarray,
    bias: jnp.ndarray,
    factors: jnp.ndarray,
    s_input: float,
    *,
    kernel: int = 7,
    relu: bool = True,
    pool: bool = True,
    bands: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """fp32 NCHW image -> pooled int8 NHWC stem activation.

    Fuses quantize -> space-to-depth -> (kernel x kernel, stride 2,
    pad kernel//2) conv -> bias/ReLU/requant -> 3x3/s2/p1 maxpool.
    Bit-exact vs the unfused pipeline (quantize_input + conv2d_int8 +
    maxpool2d_int8); returns [N, H/4, W/4, O] int8 (NHWC), or
    [N, H/2, W/2, O] with ``pool=False``.

    ``bands``: row bands per image in the pooled kernel's grid (VMEM
    working-set knob); must divide H/4.
    """
    N, C, H, W = x.shape
    if H % 4 or W % 4:
        raise ValueError(f"fused stem needs H, W divisible by 4, got "
                         f"{(H, W)}")
    if C * 4 != _C_S2D or kernel != 7:
        raise ValueError("fused stem supports the 3-channel 7x7/s2 stem")
    q = quantize_input(x, s_input)
    s = space_to_depth_nhwc_from_nchw(q)                # [N,H/2,W/2,12]
    # Conv padding ((2,1),(2,1)) + channel pad 12->16, fused by XLA into
    # the quantize/s2d producer (one read of the fp32 input).
    s = jnp.pad(s, ((0, 0), (2, 1), (2, 1), (0, _C_PAD - _C_S2D)))
    w_gemm = stem_gemm_weights(weight2d, C, kernel)
    bias2d = bias.astype(jnp.int32).reshape(1, -1)
    fct2d = jnp.asarray(factors, jnp.float32).reshape(1, -1)

    if not pool:
        return _fused_stem_call(s, w_gemm, bias2d, fct2d,
                                relu=relu, interpret=interpret)

    ho, pr = H // 2, H // 4
    if pr % bands:
        raise ValueError(f"bands={bands} must divide pooled rows {pr}")
    prb = pr // bands
    # Each band's conv rows start 2 above its pool window (the pool
    # window at row r reaches conv row 2r-1), so bands overlap by 2
    # conv rows; a banded copy expresses that overlap as disjoint
    # blocks.  Band 0's two lead rows are zeros (masked in-kernel).
    sp = jnp.pad(s, ((0, 0), (2, 0), (0, 0), (0, 0)))
    xb = jnp.stack(
        [sp[:, 2 * prb * j: 2 * prb * j + 2 * prb + 5]
         for j in range(bands)], axis=1)   # [N, B, 2*prb+5, W/2+3, 16]
    out = _fused_stem_pool_call(xb, w_gemm, bias2d, fct2d,
                                relu=relu,
                                interpret=interpret)    # [N, pr, ho, O]
    # Column half of the maxpool (cols {2c-1, 2c, 2c+1}) — one small
    # XLA elementwise pass on the 4x-reduced tensor.
    N2, pr2, wo, O2 = out.shape
    pc = wo // 2
    c2 = out.reshape(N2, pr2, pc, 2, O2)
    ve, vo = c2[:, :, :, 0], c2[:, :, :, 1]
    vo_left = jnp.pad(vo[:, :, :pc - 1], ((0, 0), (0, 0), (1, 0), (0, 0)),
                      constant_values=-128)
    return jnp.maximum(jnp.maximum(ve, vo), vo_left)
