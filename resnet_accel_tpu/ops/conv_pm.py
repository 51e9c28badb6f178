"""Pixel-major row-streaming 3x3 conv Pallas kernel (the 64-channel
residual-trunk engine).

Why it exists: XLA's int8 conv emitter tops out near HALF the MXU on the
C_in = C_out = 64 ResNet layers (b0/b1 and friends) — 64 output channels
fill only 64 of the 128 MXU output lanes, and every natural GEMM
formulation of the conv inherits that (measured: pair-folded,
block-diagonal and isolated variants all land on the same ~50% ceiling;
docs/ARCHITECTURE.md §7).  This kernel breaks the ceiling with a
**kh-split** formulation: the 3 tap rows are zero-padded to 4 and split
into two 2-row halves, stacked as 2*C = 128 *output* rows of one GEMM —

    R(t) = G x [row(t-2); row(t-1)],   G : [128, 128] per kw tap
    R_top(t) = w[-1] . row(t-1)            (tap row kh = -1)
    R_bot(t) = w[0] . row(t-2) + w[+1] . row(t-1)
    out(i)   = R_top(i) + R_bot(i+2)

so every matmul runs with all 128 output lanes live and K = 128 exact
(the zero tap row costs 4/3 compute but measured >2x net; the split
halves recombine with a 2-row-delayed int32 add in VMEM — int32 adds
are associative so the result is bit-exact vs the reference conv,
golden_models.cpp:684,883 semantics).

Data layout is **pixel-major batch-minor**: activations live as
[H, C, W*N] int8 with (pixel, batch) merged on lanes — batch N a
multiple of 128 makes every kw shift a whole-lane-tile offset, and the
kernel's output layout equals its input layout, so consecutive eligible
layers chain with zero relayouts.  The epilogue fuses bias + ReLU +
requantize (ops.epilogue.requantize) and optionally the ResNet residual
add (ops.epilogue.add_residual) — both replicated op-for-op so results
are bit-exact with the unfused composition (tested).

Reference parity: this replaces the reference's per-layer systolic
dispatch (accelerator_driver.hpp:508 run_layer) for the trunk's
64-channel convolutions; the golden contract is unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_g3(w2d: np.ndarray, c_in: int) -> np.ndarray:
    """Build the kh-split GEMM weights: [parity, kw, 2*C_out, 2*C_in].

    ``w2d`` is the model's flattened conv weight [C_out, C_in*3*3] with
    (c, kh, kw) K-order (sparse.conv_weight_to_2d / export_bsr_14x14.py
    :556).  The kernel keeps the last two activation rows in a 2-slot
    ring buffer whose slot order alternates with the grid step's parity,
    so G comes in two variants: variant v contracts row (t-2) from slot
    v and row (t-1) from slot 1-v.
    """
    c_out = w2d.shape[0]
    w4 = np.asarray(w2d).reshape(c_out, c_in, 3, 3)
    g = np.zeros((2, 3, 2 * c_out, 2 * c_in), dtype=np.int8)
    for v in range(2):
        s_tm2, s_tm1 = v * c_in, (1 - v) * c_in  # slot base of rows t-2, t-1
        for kw in range(3):
            # top half: tap kh=-1 reads row t-1
            g[v, kw, :c_out, s_tm1:s_tm1 + c_in] = w4[:, :, 0, kw]
            # bottom half: taps kh=0 (row t-2) and kh=+1 (row t-1)
            g[v, kw, c_out:, s_tm2:s_tm2 + c_in] = w4[:, :, 1, kw]
            g[v, kw, c_out:, s_tm1:s_tm1 + c_in] = w4[:, :, 2, kw]
    return g


def to_pixel_major(x: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] -> [H, C, W*N] (batch-minor lanes)."""
    N, C, H, W = x.shape
    return x.transpose(2, 1, 3, 0).reshape(H, C, W * N)


def from_pixel_major(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[H, C, W*N] -> [N, C, H, W]."""
    H, C, L = x.shape
    return x.reshape(H, C, L // n, n).transpose(3, 1, 0, 2)


def _epilogue(acc, bias, factors, relu, res, res_scales):
    """Bias + ReLU + requant (+ residual add), exactly ops.epilogue."""
    acc = acc + bias  # int32, per-channel on sublanes
    if relu:
        acc = jnp.maximum(acc, 0)
    y = jnp.rint(acc.astype(jnp.float32) * factors)
    y = jnp.clip(y, -128, 127)
    if res is None:
        return y.astype(jnp.int8)
    s_main, s_res, s_out = res_scales
    m = y.astype(jnp.float32) * jnp.float32(s_main)
    r = res.astype(jnp.float32) * jnp.float32(s_res)
    q = jnp.rint((m + r) / jnp.float32(s_out))
    q = jnp.clip(q, -128, 127)
    q = jnp.maximum(q, 0)  # post-residual ReLU (add_residual relu=True)
    return q.astype(jnp.int8)


def _kernel(x_ref, g_ref, b_ref, f_ref, *rest, H, W, N, C, relu,
            res_scales, chunk):
    """One grid step t: ingest row t-1, matmul, emit row t-2.

    The row GEMM + epilogue run over lane chunks of ``chunk`` columns so
    the int32 accumulator and float32 epilogue temporaries stay chunk-
    sized — the full-row versions blow the ~16 MB/core VMEM scoped
    limit at ImageNet layer1 geometry (L = 56*128 lanes)."""
    if res_scales is not None:
        r_ref, out_ref, pair, tops = rest
    else:
        r_ref = None
        out_ref, pair, tops = rest
    L = W * N
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        pair[...] = jnp.zeros_like(pair)

    def ingest(slot: int):
        # row t-1 into slot; rows outside [0, H) stay/become zero
        @pl.when((t >= 1) & (t <= H))
        def _():
            pair[slot * C:(slot + 1) * C, N:N + L] = x_ref[0]

        @pl.when(t == H + 1)
        def _():
            pair[slot * C:(slot + 1) * C, :] = jnp.zeros(
                (C, pair.shape[1]), jnp.int8)

    def step(v: int):
        ingest(1 - v)  # slot of row t-1 is (t-1) % 2 = 1 - v
        for lo in range(0, L, chunk):
            ch = min(chunk, L - lo)
            acc = jnp.zeros((2 * C, ch), jnp.int32)
            for kw in range(3):
                acc = acc + jax.lax.dot_general(
                    g_ref[v, kw], pair[:, kw * N + lo:kw * N + lo + ch],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            @pl.when(t >= 2)
            def _emit():
                full = tops[v, :, lo:lo + ch] + acc[C:, :]
                res = (r_ref[0, :, lo:lo + ch]
                       if r_ref is not None else None)
                out_ref[0, :, lo:lo + ch] = _epilogue(
                    full, b_ref[...], f_ref[...], relu, res, res_scales)

            tops[v, :, lo:lo + ch] = acc[:C, :]

    @pl.when(t % 2 == 0)
    def _even():
        step(0)

    @pl.when(t % 2 == 1)
    def _odd():
        step(1)


# ==========================================================================
# v2: pair-plane kernel — two rows per grid step
# ==========================================================================
#
# The v1 single-row kernel measured 327 us/conv at layer1 geometry vs a
# ~104 us MXU bound: 58 grid steps x 12 small weight-swapping matmuls
# leave the MXU idle between issues.  v2 processes a ROW PAIR per step —
# activations live as parity-split planes (even rows, odd rows), the two
# output rows (2i-1, 2i) stack as one [2C, L] GEMM result, and each kw
# tap is ONE K=4C matmul against the 2-pair ring buffer.  Same 4/3
# structural-zero overhead as v1, but half the steps, K=256 (vs 128) per
# weight load, and no int32 `tops` carry ring at all.


def pack_g3_pair(w2d: np.ndarray, c_in: int) -> np.ndarray:
    """Pair-plane GEMM weights: [variant, kw, 2*C_out, 4*C_in].

    Output rows: [0:C] = even output row 2i, [C:2C] = odd output row
    2i-1.  The ring buffer holds two row PAIRS in slots 0/1 with column
    layout [slot0.even, slot0.odd, slot1.even, slot1.odd]; at step i the
    current pair sits in slot v = i % 2.  Tap rows (w4[:, :, kh, kw]):

        out 2i   <- kh0 @ row 2i-1 (prev.odd), kh1 @ 2i (cur.even),
                    kh2 @ 2i+1 (cur.odd)
        out 2i-1 <- kh0 @ row 2i-2 (prev.even), kh1 @ 2i-1 (prev.odd),
                    kh2 @ 2i (cur.even)
    """
    c_out = w2d.shape[0]
    w4 = np.asarray(w2d).reshape(c_out, c_in, 3, 3)
    g = np.zeros((2, 3, 2 * c_out, 4 * c_in), dtype=np.int8)
    for v in range(2):
        cur_e, cur_o = 2 * v * c_in, (2 * v + 1) * c_in
        prev_e, prev_o = 2 * (1 - v) * c_in, (2 * (1 - v) + 1) * c_in
        for kw in range(3):
            g[v, kw, :c_out, prev_o:prev_o + c_in] = w4[:, :, 0, kw]
            g[v, kw, :c_out, cur_e:cur_e + c_in] = w4[:, :, 1, kw]
            g[v, kw, :c_out, cur_o:cur_o + c_in] = w4[:, :, 2, kw]
            g[v, kw, c_out:, prev_e:prev_e + c_in] = w4[:, :, 0, kw]
            g[v, kw, c_out:, prev_o:prev_o + c_in] = w4[:, :, 1, kw]
            g[v, kw, c_out:, cur_e:cur_e + c_in] = w4[:, :, 2, kw]
    return g


def pack_g3_pair_jnp(w2d, c_in: int) -> jnp.ndarray:
    """Traceable pack_g3_pair: identical layout, jnp ops only.

    Used inside the jitted forward where weights are device params (or
    baked constants — XLA folds the whole pack at compile time then).
    Bit-identical to pack_g3_pair (tested)."""
    c_out = w2d.shape[0]
    w4 = jnp.asarray(w2d).reshape(c_out, c_in, 3, 3)
    z = jnp.zeros((c_out, c_in), w4.dtype)

    def kw_block(v, kw):
        k0, k1, k2 = w4[:, :, 0, kw], w4[:, :, 1, kw], w4[:, :, 2, kw]
        if v == 0:   # cur = slot0 (cols 0, C), prev = slot1 (2C, 3C)
            even = [k1, k2, z, k0]
            odd = [k2, z, k0, k1]
        else:        # cur = slot1, prev = slot0
            even = [z, k0, k1, k2]
            odd = [k0, k1, k2, z]
        return jnp.concatenate([jnp.concatenate(even, axis=1),
                                jnp.concatenate(odd, axis=1)], axis=0)

    return jnp.stack([
        jnp.stack([kw_block(v, kw) for kw in range(3)]) for v in range(2)
    ])


def to_pm_planes(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, C, H, W] -> (even, odd) row planes, each [H/2, C, W*N]."""
    pm = to_pixel_major(x)
    return pm[0::2], pm[1::2]


def from_pm_planes(xe: jnp.ndarray, xo: jnp.ndarray,
                   n: int) -> jnp.ndarray:
    """(even, odd) [H/2, C, W*N] planes -> [N, C, H, W]."""
    H2, C, L = xe.shape
    pm = jnp.stack([xe, xo], axis=1).reshape(2 * H2, C, L)
    return from_pixel_major(pm, n)


def _kernel2(xe_ref, ge_ref, b_ref, f_ref, *rest, H2, W, N, C, relu,
             res_scales, chunk):
    """Step i: ingest pair i, emit output rows (2i-1, 2i)."""
    if res_scales is not None:
        xo_ref, re_ref, ro_ref, oe_ref, oo_ref, quad = rest
    else:
        re_ref = ro_ref = None
        xo_ref, oe_ref, oo_ref, quad = rest
    L = W * N
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        quad[...] = jnp.zeros_like(quad)

    def step(v: int):
        base = 2 * v * C

        @pl.when(i < H2)
        def _ingest():
            quad[base:base + C, N:N + L] = xe_ref[0]
            quad[base + C:base + 2 * C, N:N + L] = xo_ref[0]

        @pl.when(i == H2)
        def _drain():  # row H is zero padding; slot v holds stale data
            quad[base:base + 2 * C, :] = jnp.zeros(
                (2 * C, quad.shape[1]), jnp.int8)

        for lo in range(0, L, chunk):
            ch = min(chunk, L - lo)
            acc = jnp.zeros((2 * C, ch), jnp.int32)
            for kw in range(3):
                acc = acc + jax.lax.dot_general(
                    ge_ref[v, kw], quad[:, kw * N + lo:kw * N + lo + ch],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            @pl.when(i < H2)
            def _emit_even():  # output row 2i
                res = (re_ref[0, :, lo:lo + ch]
                       if re_ref is not None else None)
                oe_ref[0, :, lo:lo + ch] = _epilogue(
                    acc[:C, :], b_ref[...], f_ref[...], relu, res,
                    res_scales)

            @pl.when(i >= 1)
            def _emit_odd():  # output row 2i-1
                res = (ro_ref[0, :, lo:lo + ch]
                       if ro_ref is not None else None)
                oo_ref[0, :, lo:lo + ch] = _epilogue(
                    acc[C:, :], b_ref[...], f_ref[...], relu, res,
                    res_scales)

    @pl.when(i % 2 == 0)
    def _even():
        step(0)

    @pl.when(i % 2 == 1)
    def _odd():
        step(1)


@functools.partial(
    jax.jit,
    static_argnames=("n", "relu", "res_scales", "chunk", "interpret"))
def conv3x3_pm2(
    xe: jnp.ndarray,
    xo: jnp.ndarray,
    g: jnp.ndarray,
    bias: jnp.ndarray,
    factors: jnp.ndarray,
    *,
    n: int,
    relu: bool = False,
    residual: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    res_scales: Optional[Tuple[float, float, float]] = None,
    chunk: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pair-plane fused 3x3/s1/p1 int8 conv; see pack_g3_pair.

    Args:
        xe, xo: even/odd row planes [H/2, C, W*n] int8 (to_pm_planes).
        g: [2, 3, 2C, 4C] int8 pair weights (pack_g3_pair).
        residual: optional (even, odd) planes fused via the exact
            add_residual epilogue when ``res_scales`` is given.

    Returns (even, odd) output planes — the input layout, so eligible
    layers chain with zero relayouts.
    """
    H2, C, L = xe.shape
    W = L // n
    if n % 128:
        raise ValueError(f"n must be a multiple of 128, got {n}")
    if xo.shape != xe.shape:
        raise ValueError(f"plane shapes differ: {xe.shape} {xo.shape}")
    if g.shape != (2, 3, 2 * C, 4 * C):
        raise ValueError(f"g shape {g.shape} != {(2, 3, 2*C, 4*C)}")
    if (residual is None) != (res_scales is None):
        raise ValueError("residual and res_scales go together")
    kern = functools.partial(_kernel2, H2=H2, W=W, N=n, C=C, relu=relu,
                             res_scales=res_scales, chunk=chunk)
    cur = lambda i: (jnp.minimum(i, H2 - 1), 0, 0)
    prev = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
    plane = lambda idx: pl.BlockSpec((1, C, L), idx,
                                     memory_space=pltpu.VMEM)
    in_specs = [
        plane(cur),  # xe
        pl.BlockSpec((2, 3, 2 * C, 4 * C), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        plane(cur),  # xo
    ]
    args = [xe, g, bias.reshape(C, 1).astype(jnp.int32),
            factors.reshape(C, 1).astype(jnp.float32), xo]
    if residual is not None:
        in_specs += [plane(cur), plane(prev)]
        args += [residual[0], residual[1]]
    return pl.pallas_call(
        kern,
        grid=(H2 + 1,),
        in_specs=in_specs,
        out_specs=[plane(cur), plane(prev)],
        out_shape=[jax.ShapeDtypeStruct((H2, C, L), jnp.int8),
                   jax.ShapeDtypeStruct((H2, C, L), jnp.int8)],
        scratch_shapes=[
            pltpu.VMEM((4 * C, L + 2 * n), jnp.int8),   # 2-pair ring
        ],
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("n", "relu", "res_scales", "chunk", "interpret"))
def conv3x3_pm(
    x: jnp.ndarray,
    g: jnp.ndarray,
    bias: jnp.ndarray,
    factors: jnp.ndarray,
    *,
    n: int,
    relu: bool = False,
    residual: Optional[jnp.ndarray] = None,
    res_scales: Optional[Tuple[float, float, float]] = None,
    chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused 3x3/s1/p1 int8 conv(-bias-ReLU-requant)(-residual-add).

    Args:
        x: [H, C, W*n] int8 pixel-major activations (to_pixel_major).
        g: [2, 3, 2C, 2C] int8 kh-split weights (pack_g3).
        bias: [C] int32 accumulator-domain bias.
        factors: [C] float32 requant factors.
        n: batch size merged into lanes; must be a multiple of 128.
        residual: optional [H, C, W*n] int8 skip input; with
            ``res_scales = (s_main, s_res, s_out)`` the kernel fuses the
            exact add_residual epilogue (post-add ReLU included).

    Returns [H, C, W*n] int8 — same layout, so eligible layers chain.
    """
    H, C, L = x.shape
    W = L // n
    if n % 128:
        raise ValueError(f"n must be a multiple of 128, got {n}")
    if g.shape != (2, 3, 2 * C, 2 * C):
        raise ValueError(f"g shape {g.shape} != {(2, 3, 2*C, 2*C)}")
    if (residual is None) != (res_scales is None):
        raise ValueError("residual and res_scales go together")
    kern = functools.partial(_kernel, H=H, W=W, N=n, C=C, relu=relu,
                             res_scales=res_scales, chunk=chunk)
    row = lambda t: (jnp.clip(t - 1, 0, H - 1), 0, 0)
    emit = lambda t: (jnp.maximum(t - 2, 0), 0, 0)
    in_specs = [
        pl.BlockSpec((1, C, L), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 3, 2 * C, 2 * C), lambda t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, g, bias.reshape(C, 1).astype(jnp.int32),
            factors.reshape(C, 1).astype(jnp.float32)]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, C, L), emit, memory_space=pltpu.VMEM))
        args.append(residual)
    return pl.pallas_call(
        kern,
        grid=(H + 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, L), emit, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, L), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2 * C, L + 2 * n), jnp.int8),   # padded row pair
            pltpu.VMEM((2, C, L), jnp.int32),           # top halves ring
        ],
        interpret=interpret,
    )(*args)
