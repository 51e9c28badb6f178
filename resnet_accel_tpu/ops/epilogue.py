"""Fused output epilogues (JAX) — bit-exact with the numpy goldens.

The reference fuses ReLU -> scale -> saturate-to-int8 into its output
accumulator (hw/rtl/buffer/output_accumulator.sv:1-62); the C++ golden
defines the exact arithmetic (golden_models.cpp:378-410 requantize,
:465-490 residual add).  These jnp ops reproduce that arithmetic in
float32 with round-half-to-even so XLA/TPU results match the numpy
goldens bit-for-bit.  They fuse into the surrounding kernels under jit.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def requantize(
    acc: jnp.ndarray,
    factors,
    relu: bool = False,
    bias: Optional[jnp.ndarray] = None,
    axis: int = -1,
) -> jnp.ndarray:
    """int32 accumulator -> int8, matching golden requantize semantics.

    out = clip(rint(float32(relu(acc + bias)) * factors), -128, 127)

    ``factors`` is ``in_scale / out_scale`` — precomputed in float32 by the
    caller (scalar or per-channel along ``axis``).  ``bias`` is int32 in
    the accumulator domain (quant.bias_to_int32).  ReLU is applied on the
    int32 accumulator pre-requant (golden relu_int32 placement).
    """
    acc = acc.astype(jnp.int32)
    if bias is not None:
        shape = [1] * acc.ndim
        shape[axis] = -1
        acc = acc + bias.astype(jnp.int32).reshape(shape)
    if relu:
        acc = jnp.maximum(acc, 0)
    factors = jnp.asarray(factors, dtype=jnp.float32)
    if factors.ndim > 0 and factors.size > 1:
        shape = [1] * acc.ndim
        shape[axis] = -1
        factors = factors.reshape(shape)
    scaled = acc.astype(jnp.float32) * factors
    rounded = jnp.rint(scaled)
    return jnp.clip(rounded, -128, 127).astype(jnp.int8)


def requant_factors(
    act_scale: float, wgt_scales: np.ndarray, out_scale: float
) -> np.ndarray:
    """Precompute float32 requant factors = act_scale*wgt_scale/out_scale.

    Computed in float32 end-to-end so the golden and TPU paths share the
    exact same constants (the C++ golden computes float scale_factor =
    in_scale / out_scale, golden_models.cpp:390).
    """
    in_scales = (np.float32(act_scale)
                 * np.asarray(wgt_scales, dtype=np.float32))
    return (in_scales / np.float32(out_scale)).astype(np.float32)


def requantize_q16(
    acc: jnp.ndarray, scale_q16: int, relu: bool = False
) -> jnp.ndarray:
    """Hardware-exact Q16.16 requantization (replay of the FPGA datapath).

    Bit-exact with golden.requantize_q16 / output_accumulator.sv:397-426:
    ``sat8((relu(acc) * (scale_q16 & 0xFFFF)) >> 16)`` with a wide product
    and floor shift.  TPUs have no int64, so the 48-bit product is computed
    exactly in int32/uint32 pieces: split acc = q·2¹⁶ + r (q = acc >> 16
    arithmetic, r ∈ [0, 65535]); then
    ``floor(acc·s / 2¹⁶) = q·s + (r·s) >> 16`` — q·s fits int32
    (|q| ≤ 2¹⁵, s < 2¹⁶) and r·s fits uint32.  ``scale_q16`` is a static
    per-layer register value (CSR SCALE semantics), not a traced array.
    """
    acc = acc.astype(jnp.int32)
    if relu:
        acc = jnp.maximum(acc, 0)
    s = int(scale_q16) & 0xFFFF
    q = jnp.right_shift(acc, 16)  # arithmetic shift: floor(acc / 2^16)
    r = (acc - (q << 16)).astype(jnp.uint32)  # remainder in [0, 65535]
    low = jnp.right_shift(r * jnp.uint32(s), 16).astype(jnp.int32)
    scaled = q * jnp.int32(s) + low
    return jnp.clip(scaled, -128, 127).astype(jnp.int8)


def exact_inv_out_scale(
    main_scale: float, residual_scale: float, out_scale: float
) -> Optional[float]:
    """Verified reciprocal for the residual-add requant divide.

    The golden semantics divide: ``q = rint(sum / out_scale)``
    (reference ``golden_models.cpp:465-495`` uses
    ``nearbyint(sum / out_scale)``).  f32 division is the single most
    expensive VPU op in the fused conv+add epilogue — measured ~1/3 of
    the whole residual-join cost at batch 128 (docs/ARCHITECTURE.md).

    A multiply by the f32 reciprocal is NOT exact in general, but here
    the inputs are int8 and the scales are static, so ``sum`` ranges
    over at most 256x256 reachable f32 values — small enough to check
    the divide and the multiply against each other EXHAUSTIVELY.  This
    returns ``float(1/out_scale)`` iff every reachable (main, residual)
    pair requantizes identically under both (post-saturation), else
    None.  Bit-exactness stays verified, never assumed: callers use the
    multiply only on a proof for their exact scale triple, and the
    numpy golden keeps dividing (it is the spec).
    """
    y = np.arange(-128, 128, dtype=np.float32)
    m = y * np.float32(main_scale)
    r = y * np.float32(residual_scale)
    s = m[:, None] + r[None, :]
    qd = np.clip(np.rint(s / np.float32(out_scale)), -128, 127)
    inv0 = np.float32(1.0) / np.float32(out_scale)
    # the rounded reciprocal is not always the candidate that matches
    # the divide on every reachable pair — its 1-ulp neighbours can be
    # (round 5): trying all three roughly doubles proof coverage, and
    # any candidate that passes the exhaustive check is equally valid
    for inv in (inv0, np.nextafter(inv0, np.float32(0), dtype=np.float32),
                np.nextafter(inv0, np.float32(np.inf), dtype=np.float32)):
        qm = np.clip(np.rint(s * inv), -128, 127)
        if np.array_equal(qd, qm):
            return float(inv)
    return None


def exact_pow2_inv(scale: float) -> Optional[float]:
    """Exact f32 reciprocal for a power-of-two scale, else None.

    When ``scale`` is exactly a power of two, ``x / scale`` and
    ``x * (1/scale)`` are the SAME f32 operation for every input —
    scaling by 2^k only shifts the exponent, so the infinitely-precise
    quotient and product coincide and round identically (including
    subnormal and overflow cases).  Kernels can then replace the VPU
    divide in the golden quantize ``rint(x / s)`` with a multiply,
    bit-for-bit, with no per-value sweep required.  Calibrators opt in
    by snapping the activation scale to a power of two
    (``pow2_scale``), the classic fixed-point-hardware discipline (the
    reference's own requant datapath is Q16.16,
    output_accumulator.sv:397-426).
    """
    import math

    s32 = np.float32(scale)
    if not np.isfinite(s32) or s32 <= 0:
        return None
    m, _ = math.frexp(float(s32))
    if m != 0.5:
        return None
    inv = np.float32(1.0) / s32
    if not np.isfinite(inv):
        return None
    return float(inv)


def pow2_scale(scale: float) -> float:
    """Snap a calibrated scale UP to the next power of two.

    Rounding up keeps the representable range a superset of the
    calibrated one (no new clipping); the cost is at most one bit of
    input resolution.  The returned value satisfies
    ``exact_pow2_inv(pow2_scale(s)) is not None``.
    """
    import math

    s = float(np.float32(scale))
    if s <= 0 or not math.isfinite(s):
        raise ValueError(f"scale must be positive finite, got {scale}")
    m, e = math.frexp(s)            # s = m * 2**e, m in [0.5, 1)
    snapped = math.ldexp(1.0, e - 1) if m == 0.5 else math.ldexp(1.0, e)
    return float(np.float32(snapped))


def add_residual(
    main: jnp.ndarray,
    residual: jnp.ndarray,
    main_scale: float,
    residual_scale: float,
    out_scale: float,
    relu: bool = False,
    inv_out_scale: Optional[float] = None,
) -> jnp.ndarray:
    """ResNet skip add across scales (golden add_residual_int8).

    Dequantize both int8 paths to float32, add, requantize with
    round-half-even + saturation.  Optional fused ReLU *after* the add
    (the post-residual ReLU of a ResNet block) applied in int8 domain —
    equivalent to clamping at 0 before saturation.

    ``inv_out_scale``: pass ``exact_inv_out_scale(...)``'s result to
    requantize by multiply instead of divide — only valid with a proof
    for this exact scale triple (bit-identical by exhaustive check over
    every reachable int8 pair; None or a failed proof keeps the golden
    divide).
    """
    m = main.astype(jnp.float32) * jnp.float32(main_scale)
    r = residual.astype(jnp.float32) * jnp.float32(residual_scale)
    s = m + r
    if inv_out_scale is not None:
        q = jnp.rint(s * jnp.float32(inv_out_scale))
    else:
        q = jnp.rint(s / jnp.float32(out_scale))
    q = jnp.clip(q, -128, 127)
    if relu:
        q = jnp.maximum(q, 0)
    return q.astype(jnp.int8)


def relu_int8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0).astype(jnp.int8)


def relu6_int8(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Clamped ReLU with the golden's truncated upper bound."""
    max_val = jnp.int8(int(np.float32(6.0) / np.float32(scale)))
    return jnp.clip(x, 0, max_val).astype(jnp.int8)


def quantize_input(
    x: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """fp32 -> int8 with the reference's symmetric formula (rint + clip)."""
    q = jnp.rint(x.astype(jnp.float32) / jnp.float32(scale))
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def dequantize_output(x: jnp.ndarray, scale) -> jnp.ndarray:
    """int -> fp32 logits."""
    scale = jnp.asarray(scale, dtype=jnp.float32)
    return x.astype(jnp.float32) * scale
