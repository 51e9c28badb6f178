"""INT8 convolution on TPU via im2col -> MXU GEMM.

The reference lowers conv to GEMM through im2col so its systolic array can
run it (golden_models.cpp:801-933); the TPU rebuild keeps that lowering —
the MXU is also a GEMM engine — but the im2col transform is pure XLA data
movement (static strided slices, fused by the compiler) and the GEMM is
the Pallas int8 kernel.

Weights arrive pre-flattened [C_out, C_in*K*K] (sparse.conv_weight_to_2d,
matching export_bsr_14x14.py:556).  All dtypes stay int8/int32 end to end:
no float promotion anywhere in the conv path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from resnet_accel_tpu.ops.epilogue import requantize
from resnet_accel_tpu.ops.matmul_int8 import matmul_int8


def im2col_nchw(
    x: jnp.ndarray, kernel: int, stride: int, padding: int
) -> jnp.ndarray:
    """[N, C, H, W] int8 -> [N, H_out*W_out, C*K*K] patch tensor.

    Row order within a patch is (c, kh, kw) — identical to the golden
    im2col_int8 (golden_models.cpp:817-838) so the flattened-weight GEMM
    contracts the same elements.
    Pure static slicing: K*K strided slices stacked — XLA fuses this, no
    gather needed, works for any dtype (stays int8).
    """
    N, C, H, W = x.shape
    K = kernel
    H_out = (H + 2 * padding - K) // stride + 1
    W_out = (W + 2 * padding - K) // stride + 1
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding),
                        (padding, padding)))
    patches = []
    for kh in range(K):
        for kw in range(K):
            sl = x[:, :, kh:kh + stride * H_out:stride,
                   kw:kw + stride * W_out:stride]          # [N,C,Ho,Wo]
            patches.append(sl)
    # [K*K, N, C, Ho, Wo] -> [N, Ho, Wo, C, K*K] -> [N, Ho*Wo, C*K*K]
    p = jnp.stack(patches, axis=0)
    p = p.transpose(1, 3, 4, 2, 0)
    return p.reshape(N, H_out * W_out, C * K * K)


def space_to_depth_nchw(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[N, C, H, W] -> [N, C*block^2, H/block, W/block]; channel order is
    (c, row-parity, col-parity) to match stem_s2d_weights."""
    N, C, H, W = x.shape
    x = x.reshape(N, C, H // block, block, W // block, block)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(N, C * block * block, H // block, W // block)


def space_to_depth_nhwc(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/block, W/block, C*block^2]; same
    (c, row-parity, col-parity) channel order as space_to_depth_nchw /
    stem_s2d_weights."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // block, block, W // block, block, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(N, H // block, W // block, C * block * block)


def stem_s2d_weights(weight2d, in_c: int, kernel: int) -> jnp.ndarray:
    """Space-to-depth transform of a (kernel, stride 2, pad kernel//2)
    conv weight — the MLPerf ResNet stem trick, exact in int8.

    The k x k taps are zero-padded at the front to (k+1) x (k+1) and
    regrouped by (row, col) parity into a ((k+1)/2)^2-tap conv over the
    2x2-space-to-depth input.  Every original product is preserved and
    the added taps multiply structural zeros, so int32 accumulation is
    bit-identical.  Use with space_to_depth_nchw(x) and padding
    ((p+1)//2, (p-1)//2) per side where p = kernel//2.
    """
    if kernel % 2 == 0:
        raise ValueError("stem_s2d_weights expects an odd kernel")
    O = weight2d.shape[0]
    # jnp ops so the single implementation serves both the host (numpy
    # weights at export time) and the traced forward (device params).
    w4 = jnp.asarray(weight2d).reshape(O, in_c, kernel, kernel)
    w8 = jnp.pad(w4, ((0, 0), (0, 0), (1, 0), (1, 0)))
    k2 = (kernel + 1) // 2
    w = w8.reshape(O, in_c, k2, 2, k2, 2).transpose(0, 1, 3, 5, 2, 4)
    return w.reshape(O, -1)


def fold2_rows_weights(weight2d, in_c: int, kernel: int) -> jnp.ndarray:
    """Row-pair output fold of a stride-1 conv weight: [O, C*k*k] ->
    [2O, C*(k+1)*k] block-Toeplitz.

    Output rows 2h2+p (p = 0, 1) of the original conv both read input
    rows 2h2-pt .. 2h2-pt+k: one (k+1)-row window.  Folding the pair
    into channels makes the conv a kernel (k+1, k), stride (2, 1),
    C_out = 2O convolution whose output [N, 2O, H/2, W'] holds row
    2h2+p at channel p*O+o — W2[p*O+o, c, kh, kw] = W[o, c, kh-p, kw]
    (structural zeros elsewhere), so int32 accumulation is
    bit-identical.  Purpose: C_out = 64 fills only half the MXU's 128
    output lanes (the measured 64-channel conv ceiling,
    docs/ARCHITECTURE.md §7); the folded form runs at full lanes with
    k/(k+1) useful-FLOP density — for the 4x4 s2d stem conv, 80% useful
    at 100% lanes beats the unfolded 100% useful at 50% lanes.
    """
    O = weight2d.shape[0]
    w4 = jnp.asarray(weight2d).reshape(O, in_c, kernel, kernel)
    w_p0 = jnp.pad(w4, ((0, 0), (0, 0), (0, 1), (0, 0)))   # kh' = kh
    w_p1 = jnp.pad(w4, ((0, 0), (0, 0), (1, 0), (0, 0)))   # kh' = kh+1
    return jnp.concatenate([w_p0, w_p1], axis=0).reshape(2 * O, -1)


def stem_conv_pool_fold2(
    x: jnp.ndarray,
    weight2d: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    kernel: int = 4,
    padding=((2, 1), (2, 1)),
    factors,
    relu: bool = True,
    method: str = "native",
) -> jnp.ndarray:
    """Fused stem conv + 3x3/s2/p1 maxpool via the row-pair fold.

    ``x`` [N, C, H, W] int8 (the space-to-depth stem input), ``weight2d``
    [O, C*k*k] (stem_s2d_weights output).  Computes the stride-1 conv
    with ``padding`` and the stem maxpool in the FOLDED layout — the
    [N, 2O, H/2, W] conv output is consumed directly by channel-half
    slices, so the half-lane unfolded [N, O, H, W] tensor never
    materializes in HBM.  Bit-exact equal to

        maxpool2d_int8(conv2d_int8(x, w2d, bias, kernel=k, stride=1,
                                   padding=padding, factors=f, relu=r),
                       3, 2, padding=1)

    (requant is per-channel elementwise — identical factor for a row
    pair's two copies of channel o — and max commutes with it; tested).

    Pool-row algebra: pool row j maxes conv rows 2j-1, 2j, 2j+1 =
    fold[p=1, h2=j-1] (pad -128 at j=0), fold[p=0, h2=j],
    fold[p=1, h2=j]; the W direction stays a plain reduce_window.
    """
    N, C, H, W = x.shape
    O2 = 2 * weight2d.shape[0]
    O = O2 // 2
    (pt, pb), pw = padding
    if H % 2:
        raise ValueError("row-pair fold needs even H")
    w4 = fold2_rows_weights(weight2d, C, kernel).reshape(
        O2, C, kernel + 1, kernel)
    if method == "bf16":
        # Same exact-bf16 reformulation as conv2d_int8 (|acc| <=
        # C*(k+1)*k*127*128 < 2^24 needs C*(k+1)*k <= 1024; the s2d
        # stem is 12*5*4 = 240).
        if C * (kernel + 1) * kernel > 1024:
            raise ValueError("bf16 fold2 route is exact only for "
                             f"C*(k+1)*k <= 1024 (got "
                             f"{C * (kernel + 1) * kernel})")
        acc = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w4.astype(jnp.bfloat16),
            (2, 1), [(pt, pb), tuple(pw)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        acc = jax.lax.conv_general_dilated(
            x, w4, (2, 1), [(pt, pb), tuple(pw)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32)           # [N, 2O, H/2, W']
    f2 = jnp.asarray(factors, dtype=jnp.float32)
    if f2.ndim > 0 and f2.size > 1:
        f2 = jnp.tile(f2, 2)
    b2 = None if bias is None else jnp.tile(jnp.asarray(bias), 2)
    fold = requantize(acc, f2, relu=relu, bias=b2, axis=1)
    lo, hi = fold[:, :O], fold[:, O:]
    prev_hi = jnp.concatenate(
        [jnp.full_like(hi[:, :, :1], -128), hi[:, :, :-1]], axis=2)
    rm = jnp.maximum(jnp.maximum(prev_hi, lo), hi)      # [N, O, H/2, W']
    return jax.lax.reduce_window(
        rm, jnp.int8(-128), jax.lax.max,
        window_dimensions=(1, 1, 1, 3),
        window_strides=(1, 1, 1, 2),
        padding=((0, 0), (0, 0), (0, 0), (1, 1)))


def conv2d_int8(
    x: jnp.ndarray,
    weight2d: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    factors: Optional[np.ndarray] = None,
    relu: bool = False,
    backend: Optional[str] = None,
    use_pallas: bool = True,
    method: str = "native",
) -> jnp.ndarray:
    """Fused int8 conv(-bias)(-ReLU)(-requant): NCHW in, NCHW out.

    Args:
        x: [N, C_in, H, W] int8.
        weight2d: [C_out, C_in*K*K] int8 (flattened OIHW).
        bias: [C_out] int32 accumulator-domain bias.
        factors: per-output-channel float32 requant factors; when given the
            output is int8, else raw int32 accumulators.
        method: "native" — XLA's integer convolution (fastest; avoids
            materializing the im2col patch tensor in HBM); "im2col" —
            explicit patches -> MXU GEMM (the reference's lowering;
            use_pallas picks the GEMM kernel); or "bf16" — the conv on
            bf16-cast operands with float32 MXU accumulation (small-K
            layers only, see below).  All are bit-identical to int8x
            int8->int32 (int32 accumulation is order-independent; the
            bf16 route is exact by range analysis).

    Returns:
        [N, C_out, H_out, W_out].
    """
    N, C, H, W = x.shape
    C_out = weight2d.shape[0]
    # padding: int (symmetric) or ((top, bottom), (left, right)) —
    # asymmetric pairs are native-method only (space-to-depth stems).
    if isinstance(padding, int):
        pad_hw = [(padding, padding), (padding, padding)]
    else:
        pad_hw = [tuple(padding[0]), tuple(padding[1])]
        if method == "im2col":
            raise ValueError("asymmetric padding requires a lax.conv "
                             "method ('native' or 'bf16')")
    H_out = (H + sum(pad_hw[0]) - kernel) // stride + 1
    W_out = (W + sum(pad_hw[1]) - kernel) // stride + 1

    if method in ("native", "bf16"):
        w4d = weight2d.reshape(C_out, C, kernel, kernel)
        if method == "bf16":
            # Exact bf16 reformulation: int8 values cast to bf16 exactly,
            # each bf16 x bf16 product is exact in float32 (<= 16 mantissa
            # bits), and every f32 partial sum stays integer-exact while
            # |acc| <= K*127*128 < 2^24 — i.e. for K = C_in*k*k <= 1024.
            # MXU bf16 throughput is half the int8 peak, but the bf16 conv
            # emitter handles narrow channel counts far better, so this
            # wins on the 64-channel layers (measured, tools/route_tune.py).
            if C * kernel * kernel > 1024:
                raise ValueError(
                    f"bf16 conv route is exact only for C_in*K*K <= 1024 "
                    f"(got {C * kernel * kernel})")
            acc = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w4d.astype(jnp.bfloat16),
                (stride, stride), pad_hw,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        else:
            acc = jax.lax.conv_general_dilated(
                x, w4d, (stride, stride), pad_hw,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32)
        if factors is not None:
            return requantize(acc, factors, relu=relu, bias=bias, axis=1)
        if bias is not None:
            acc = acc + bias.astype(jnp.int32)[None, :, None, None]
        if relu:
            acc = jnp.maximum(acc, 0)
        return acc

    patches = im2col_nchw(x, kernel, stride, padding)   # [N, P, CKK]
    a = patches.reshape(N * H_out * W_out, -1)          # [N*P, CKK]
    out = matmul_int8(
        a, weight2d.T,
        bias=bias, factors=factors, relu=relu,
        backend=backend, use_pallas=use_pallas)         # [N*P, C_out]
    out = out.reshape(N, H_out, W_out, C_out)
    return out.transpose(0, 3, 1, 2)


def conv2d_int8_nhwc(
    x: jnp.ndarray,
    weight_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    factors: Optional[np.ndarray] = None,
    relu: bool = False,
) -> jnp.ndarray:
    """Channel-minor int8 conv: [N, H, W, C] x HWIO -> [N, Ho, Wo, O].

    The NHWC layout is the TPU's native convolution layout (channels on
    lanes) — measured up to 3x faster than NCHW on early ResNet layers.
    Same int8x int8 -> int32 + fused epilogue contract; weights arrive
    pre-transposed to HWIO once at load time (models precompute them).
    ``padding``: int or ((top, bottom), (left, right)).
    """
    if isinstance(padding, int):
        pad_hw = [(padding, padding), (padding, padding)]
    else:
        pad_hw = [tuple(padding[0]), tuple(padding[1])]
    acc = jax.lax.conv_general_dilated(
        x, weight_hwio, (stride, stride), pad_hw,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    if factors is not None:
        return requantize(acc, factors, relu=relu, bias=bias, axis=-1)
    if bias is not None:
        acc = acc + bias.astype(jnp.int32)[None, None, None, :]
    if relu:
        acc = jnp.maximum(acc, 0)
    return acc
