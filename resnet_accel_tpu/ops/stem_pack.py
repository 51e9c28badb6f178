"""Fused input quantize + space-to-depth Pallas kernel.

The ImageNet stem front (fp32 input -> int8 -> 2x2 space-to-depth) is
pure data movement, but XLA lowers it as three serial passes — a
quantize fusion, a layout copy, and the s2d transpose copy — ~330 us at
batch 128 where the HBM roofline is ~120 us (read 77 MB fp32, write
19 MB int8).  quantize_s2d_wh does all of it in one pass: each grid
step reads one (image, channel) plane [224, 224] fp32, quantizes
in-VMEM (rint + clip, exactly ops.epilogue.quantize_input / the
reference's symmetric formula, sw/INT8 quantization/quantize.py:55),
splits the 2x2 pixel parities with sublane bitcasts + one transpose
(see _kernel_wh — Mosaic cannot lower lane-strided slices), and writes
the four [112, 112] int8 parity planes in (W, H)-transposed order.

Output channel order is (c, row-parity, col-parity) — identical to
ops.conv.space_to_depth_nchw, so stem_s2d_weights pairs with it
unchanged (modulo the tap transpose, transpose_taps) and the
composition is bit-exact (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_wh(x_ref, out_ref, *, scale: float):
    """Parity split without strided slices (Mosaic lowers those to an
    unsupported gather): bitcast packs SUBLANE pairs, so one int8->int16
    bitcast captures row parity in the two bytes, a transpose moves
    columns onto sublanes, and a second bitcast to int32 packs the full
    2x2 pixel cell per element; the four parities are byte extractions.
    The output spatial axes come out transposed (W', H') — free for the
    consumer, see quantize_s2d_wh.

    Quantize DIVIDES by scale (not multiply-by-reciprocal): rint ties
    sit 1 ulp apart between the two forms, and bit-exactness with
    ops.epilogue.quantize_input is the contract."""
    x = x_ref[0, 0]                                   # [H, W] fp32
    q = jnp.rint(x / jnp.float32(scale))
    q = jnp.clip(q, -128, 127).astype(jnp.int8)       # [H, W] int8
    v16 = pltpu.bitcast(q, jnp.int16)                 # [H/2, W] row pairs
    v32 = pltpu.bitcast(v16.T, jnp.int32)             # [W/2, H/2] 2x2 cell
    for rp in range(2):
        for cp in range(2):
            out_ref[0, rp * 2 + cp] = jnp.right_shift(
                v32, 8 * (2 * cp + rp)).astype(jnp.int8)


def quantize_s2d_nchw(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Reference composition: [N, C, H, W] fp32 -> [N, C*4, H/2, W/2]
    int8 via quantize_input + space_to_depth_nchw (XLA ops — the
    semantic baseline quantize_s2d_wh is tested against; a direct
    NCHW-output Pallas kernel is not expressible, lane-strided parity
    slices lower to an unsupported gather)."""
    from resnet_accel_tpu.ops.conv import space_to_depth_nchw
    from resnet_accel_tpu.ops.epilogue import quantize_input
    return space_to_depth_nchw(quantize_input(x, scale))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def quantize_s2d_wh(x: jnp.ndarray, scale: float,
                    interpret: bool = False) -> jnp.ndarray:
    """[N, C, H, W] fp32 -> [N, C*4, W/2, H/2] int8: fused quantize +
    2x2 space-to-depth with TRANSPOSED spatial axes, in one HBM pass.

    Bit-exact equal to
    ``space_to_depth_nchw(quantize_input(x, scale)).swapaxes(2, 3)``.

    The (W', H') spatial order is the fast formulation: the parity split
    runs entirely on sublane bitcasts plus one in-VMEM transpose (see
    _kernel_wh) instead of XLA's two serial HBM layout copies.  Every
    op in the ResNet trunk after the stem is spatially symmetric, so a
    consumer runs on (W, H) arrays bit-exactly by transposing each
    conv's taps (models.resnet18.make_forward does this) — the network
    output is unchanged.

    In interpret mode (CPU backend) the identical arithmetic runs as
    plain XLA ops instead (the kernel's bitcasts are TPU-layout tricks
    with no interpreter value).
    """
    N, C, H, W = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"H, W must be even for 2x2 s2d, got {H}x{W}")
    if interpret:
        from resnet_accel_tpu.ops.conv import space_to_depth_nchw
        from resnet_accel_tpu.ops.epilogue import quantize_input
        return space_to_depth_nchw(
            quantize_input(x, scale)).swapaxes(2, 3)
    kern = functools.partial(_kernel_wh, scale=float(scale))
    return pl.pallas_call(
        kern,
        grid=(N, C),
        in_specs=[pl.BlockSpec((1, 1, H, W), lambda n, c: (n, c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, W // 2, H // 2),
                               lambda n, c: (n, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 4 * C, W // 2, H // 2),
                                       jnp.int8),
        interpret=interpret,
    )(x)


def _pick_ht(H: int, C: int, W: int, N: int) -> int:
    """Largest even divisor of H whose fp32 input block stays <= ~4 MB
    of VMEM (the lane dim pads to 128, so budget with max(N, 128))."""
    budget = 4 << 20
    for cand in range(min(H, 64), 1, -2):
        if H % cand == 0 and C * cand * W * max(N, 128) * 4 <= budget:
            return cand
    return 2


def _kernel_nm_bc(x_ref, out_ref, *, scale: float):
    """Bitcast variant of _kernel_nm: the W-parity split runs as ONE
    int8->int16 sublane bitcast per (c, row-parity) plane — adjacent W
    sublanes pack into one int16 lane-row, the two parities are its low
    and high bytes (shift + truncating cast, the _kernel_wh trick) —
    instead of 2 sublane-STRIDED slice reads.  Strided sublane access
    serializes in Mosaic; the bitcast form is whole-register moves.
    6 contiguous reads / 12 contiguous stores per grid step."""
    C, HH, _, W, N = x_ref.shape
    for c in range(C):
        for rp in range(2):
            x = x_ref[c, :, rp]                       # [HH, W, N] f32
            q = jnp.rint(x / jnp.float32(scale))
            q = jnp.clip(q, -128, 127).astype(jnp.int8)
            v16 = pltpu.bitcast(q, jnp.int16)         # [HH, W/2, N]
            # Shift in int32: Mosaic legalizes int32 shifts (the
            # _kernel_wh path) but not int16 ones (arith.shrui fails).
            v32 = v16.astype(jnp.int32)
            for cp in range(2):
                out_ref[:, :, c * 4 + rp * 2 + cp, :] = \
                    jnp.right_shift(v32, 8 * cp).astype(jnp.int8)


def _kernel_nm(x_ref, out_ref, *, scale: float):
    """Batch-minor parity split: with batch N on lanes, the W parity is
    a SUBLANE-strided ref read (Mosaic lowers sublane strides fine; it
    is LANE strides that become unsupported gathers, see _kernel_wh)
    and the H parity is a static index on an outer dim (the wrapper
    pre-splits H into (H/2, 2) with a free outer-dim reshape).  No
    bitcasts, no in-VMEM transposes — every plane lands in its natural
    layout.  Quantize divides by scale (the quantize_input contract,
    see _kernel_wh).  The per-plane store's singleton-insert reshape
    only legalizes at full 128 lanes — hence the wrapper's N%128 gate.
    """
    C, HH, _, W, N = x_ref.shape
    for c in range(C):
        for rp in range(2):
            for cp in range(2):
                x = x_ref[c, :, rp, cp::2, :]         # [HH, W/2, N] f32
                q = jnp.rint(x / jnp.float32(scale))
                q = jnp.clip(q, -128, 127).astype(jnp.int8)
                out_ref[:, :, c * 4 + rp * 2 + cp, :] = q


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def quantize_s2d_nm(x: jnp.ndarray, scale: float,
                    interpret: bool = False) -> jnp.ndarray:
    """[N, C, H, W] fp32 -> [N, C*4, H/2, W/2] int8: fused quantize +
    2x2 space-to-depth in one HBM pass, formulated BATCH-MINOR.

    Bit-exact equal to ``space_to_depth_nchw(quantize_input(x, scale))``
    — same logical result as quantize_s2d_nchw, but the kernel runs on a
    [C, H, W, N] view of the input and emits [H/2, W/2, C*4, N].  On
    TPU both transposes are free relayouts: XLA's auto entry layout for
    a batch-128 image tensor is batch-minor ``{0,3,2,1}`` (batch fills
    the 128 lanes), byte-identical to the [C, H, W, N] view, and the
    emitted [H/2, W/2, C*4, N] bytes are exactly the batch-minor
    ``{0,1,3,2}`` activation layout XLA's conv emitter wants next.
    This kills both relayout copies the default-layout kernel
    (quantize_s2d_wh) forces (~246 us at batch 128) AND the WH pipeline's
    tap-transposed trunk — downstream convs take untransposed taps, so
    the route composes with BSR-sparse layers too.

    The kernel's per-plane stores only legalize at EXACTLY 128 lanes
    (Mosaic: "last dim size is not 128 in original base memref" for any
    other width), so for N != 128 this falls back to the reference
    composition — bit-identical, just not single-pass; the throughput
    path (batch 128) always takes the kernel.
    """
    N, C, H, W = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"H, W must be even for 2x2 s2d, got {H}x{W}")
    if not interpret and N != 128:
        return quantize_s2d_nchw(x, scale)
    xt = x.transpose(1, 2, 3, 0).reshape(C, H // 2, 2, W, N)
    ht = _pick_ht(H, C, W, N)
    kern = functools.partial(_kernel_nm, scale=float(scale))
    out = pl.pallas_call(
        kern,
        grid=(H // ht,),
        in_specs=[pl.BlockSpec((C, ht // 2, 2, W, N),
                               lambda i: (0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ht // 2, W // 2, 4 * C, N),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H // 2, W // 2, 4 * C, N),
                                       jnp.int8),
        interpret=interpret,
    )(xt)
    return out.transpose(3, 2, 0, 1)                  # NCHW view


def transpose_taps(w2d: jnp.ndarray, in_c: int, kernel: int):
    """Swap a flattened conv weight's kh/kw taps: [O, C*k*k] with
    (c, kh, kw) K-order -> (c, kw, kh).  Convolving a spatially
    transposed (W, H) activation with tap-transposed weights equals the
    transposed original conv — the identity the WH pipeline rests on."""
    O = w2d.shape[0]
    w4 = jnp.asarray(w2d).reshape(O, in_c, kernel, kernel)
    return w4.swapaxes(2, 3).reshape(O, -1)
