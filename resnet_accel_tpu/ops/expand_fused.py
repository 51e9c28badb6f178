"""Fused bottleneck expansion: 1x1 conv + requant + residual add in one
HBM pass.

The measured ResNet-50 profile (tools/profile_tpu.py, batch 128) puts
~53% of device time in the c3 expansion convs and their residual joins:
XLA fuses conv+requant+dequant-add-requant into one kernel, but that
fusion runs at ~2x its bandwidth floor (b0.c3: 614 us vs the 300 us
floor of read-x + read-residual + write-out; the SAME conv without the
residual epilogue — b0.ds — runs at its 157 us floor).  The standalone
add is memory-bound too (a trivial elementwise OR over the same arrays
costs the same ~480 us), so the loss is XLA's fused-loop schedule, not
VPU arithmetic.

This kernel does the whole join with exactly-once HBM traffic and lets
Mosaic overlap the MXU dots, the f32 epilogue, and the DMA streams:

    acc  = W[C_out, C_in] @ x[..., C_in, n]      (int8 x int8 -> int32)
    y    = clip(rint(f32(acc + bias) * factors)) (golden requantize,
                                                  conv3 has no ReLU)
    out  = relu(clip(rint((y*s_main + r*s_res) * inv_or_div)))
                                                  (golden add_residual)

Bit-exactness contract: identical to
    conv2d_int8(kernel=1, stride=1, relu=False, factors=...) followed by
    add_residual(..., relu=True[, inv_out_scale])
per the reference semantics (golden_models.cpp:378-410 requantize,
:465-495 add_residual; the verified-reciprocal multiply is used only
under ops.epilogue.exact_inv_out_scale's exhaustive proof).

Layout: operands are passed as [H, W, C, N] views of the NCHW trunk
tensors — N (batch) minor, C next — which is exactly the {0,1,3,2}
activation layout XLA's conv emitter uses for the surrounding int8
convs, so the transposes at the kernel boundary are free relayouts
(same trick as ops/stem_fused.py; verified by xprof in-model: no copy
ops appear around the custom call).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, f_ref, r_ref, o_ref, *, width: int,
            s_main: float, s_res: float, s_out: float,
            inv_out: Optional[float]):
    for w in range(width):
        acc = jax.lax.dot_general(
            w_ref[:], x_ref[0, w], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + b_ref[:, 0:1]
        y = jnp.clip(jnp.rint(acc.astype(jnp.float32) * f_ref[:, 0:1]),
                     -128, 127)
        s = (y * jnp.float32(s_main)
             + r_ref[0, w].astype(jnp.float32) * jnp.float32(s_res))
        if inv_out is not None:
            q = jnp.rint(s * jnp.float32(inv_out))
        else:
            q = jnp.rint(s / jnp.float32(s_out))
        q = jnp.maximum(jnp.clip(q, -128, 127), 0)
        o_ref[0, w] = q.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("s_main", "s_res", "s_out", "inv_out",
                              "interpret"))
def expand_add_int8(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                    factors: jnp.ndarray, r: jnp.ndarray,
                    s_main: float, s_res: float, s_out: float,
                    inv_out: Optional[float] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """[N, C_in, H, W] int8 -> [N, C_out, H, W] int8: 1x1 conv (+bias,
    per-channel requant, NO relu) then residual add with ``r`` (+relu),
    one HBM pass (module docstring).

    ``w``: [C_out, C_in] int8; ``bias``: int32 [C_out]; ``factors``:
    f32 [C_out] requant factors; ``r``: [N, C_out, H, W] int8 residual.
    Requires N % 128 == 0 (the throughput geometry); callers fall back
    to the unfused composition otherwise (models.resnet18).
    """
    N, C_in, H, W = x.shape
    C_out = w.shape[0]
    if N % 128 or r.shape != (N, C_out, H, W):
        raise ValueError(f"unsupported geometry N={N} r={r.shape}")
    slabs = N // 128

    xv = x.transpose(2, 3, 1, 0)       # [H, W, C_in, N]  (free view)
    rv = r.transpose(2, 3, 1, 0)       # [H, W, C_out, N]
    b2 = jnp.asarray(bias, jnp.int32).reshape(C_out, 1)
    f2 = jnp.asarray(factors, jnp.float32).reshape(C_out, 1)

    kern = functools.partial(
        _kernel, width=W, s_main=float(s_main), s_res=float(s_res),
        s_out=float(s_out),
        inv_out=None if inv_out is None else float(inv_out))
    out = pl.pallas_call(
        kern,
        grid=(slabs, H),
        in_specs=[
            pl.BlockSpec((1, W, C_in, 128), lambda b, h: (h, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out, C_in), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out, 1), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out, 1), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C_out, 128), lambda b, h: (h, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, W, C_out, 128), lambda b, h: (h, 0, 0, b),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C_out, N), jnp.int8),
        interpret=interpret,
    )(xv, w, b2, f2, rv)
    return out.transpose(3, 2, 0, 1)   # NCHW view, batch-minor phys
