"""Fused input quantize + space-to-depth Pallas kernel.

The ImageNet stem front (fp32 input -> int8 -> 2x2 space-to-depth) is
pure data movement, but XLA lowers it as three serial passes — a
quantize fusion, a layout copy, and the s2d transpose copy — ~330 us at
batch 128 where the HBM roofline is ~120 us (read 77 MB fp32, write
19 MB int8).  This kernel does all of it in one pass: each grid step
reads one (image, channel) plane [224, 224] fp32, quantizes in-VMEM
(rint + clip, exactly ops.epilogue.quantize_input / the reference's
symmetric formula, sw/INT8 quantization/quantize.py:55), splits the
2x2 pixel parities with strided lane/sublane slices, and writes the
four [112, 112] int8 parity planes.

Output channel order is (c, row-parity, col-parity) — identical to
ops.conv.space_to_depth_nchw, so stem_s2d_weights pairs with it
unchanged and the composition is bit-exact (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, out_ref, *, inv_scale: float):
    x = x_ref[0, 0]                                   # [H, W] fp32
    q = jnp.rint(x * jnp.float32(inv_scale))
    q = jnp.clip(q, -128, 127).astype(jnp.int8)       # [H, W] int8
    for rp in range(2):
        for cp in range(2):
            out_ref[0, rp * 2 + cp] = q[rp::2, cp::2]


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def quantize_s2d_nchw(x: jnp.ndarray, scale: float,
                      interpret: bool = False) -> jnp.ndarray:
    """[N, C, H, W] fp32 -> [N, C*4, H/2, W/2] int8 in one fused pass.

    Bit-exact equal to
    ``space_to_depth_nchw(quantize_input(x, scale))``; H and W must be
    even.  ``scale`` is the static input quantization scale (it is a
    model constant, so baking it specializes the program exactly like
    the fused XLA path).
    """
    N, C, H, W = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"H, W must be even for 2x2 s2d, got {H}x{W}")
    kern = functools.partial(_kernel, inv_scale=1.0 / float(scale))
    return pl.pallas_call(
        kern,
        grid=(N, C),
        in_specs=[pl.BlockSpec((1, 1, H, W), lambda n, c: (n, c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, H // 2, W // 2),
                               lambda n, c: (n, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 4 * C, H // 2, W // 2),
                                       jnp.int8),
        interpret=interpret,
    )(x)
