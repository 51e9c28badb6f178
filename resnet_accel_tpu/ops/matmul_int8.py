"""Dense INT8 matmul on the MXU — Pallas kernel + XLA path, fused epilogue.

TPU-native realization of the reference's dense datapath: the 14x14
weight-stationary systolic array + tiled scheduler + fused output
accumulator (hw/rtl/systolic/systolic_array_sparse.sv, control/scheduler.sv,
buffer/output_accumulator.sv).  On TPU the systolic array is the 128x128
MXU; the scheduler's (m, n, k) tile loop is the Pallas grid; the ping-pong
act/wgt buffers are Pallas's automatic VMEM double-buffering; and the fused
ReLU->requant->saturate output stage is the kernel epilogue.

Numerics: int8 x int8 -> int32 accumulation (order-independent, so any
tiling is bit-exact vs golden matmul_int8), then the float32
round-half-even requant of golden_models.cpp:378-410.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnet_accel_tpu.config import round_up
from resnet_accel_tpu.ops.epilogue import requantize
from resnet_accel_tpu.runtime import backend as backend_mod


def matmul_int8_xla(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C[M,N] = A[M,K] @ B[K,N], int8 inputs, int32 result (XLA path)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def _mm_kernel(a_ref, b_ref, bias_ref, fct_ref, o_ref, acc_ref, *,
               k_tiles: int, relu: bool, requant: bool, has_bias: bool):
    """Grid (m, n, k): accumulate int32 partials; epilogue on the last k.

    ``acc_ref`` is VMEM scratch that persists across the k passes of one
    (m, n) output tile — the TPU analog of output_accumulator.sv's
    double-buffered int32 accumulator.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == k_tiles - 1)
    def _epilogue():
        acc = acc_ref[:]
        if has_bias:
            acc = acc + bias_ref[:].astype(jnp.int32)
        if relu:
            acc = jnp.maximum(acc, 0)
        if requant:
            scaled = acc.astype(jnp.float32) * fct_ref[:]
            o_ref[:] = jnp.clip(jnp.rint(scaled), -128, 127).astype(jnp.int8)
        else:
            o_ref[:] = acc


def _mm_resident_kernel(a_ref, b_ref, bias_ref, fct_ref, o_ref, acc_ref, *,
                        k_chunks: int, tile_k: int, relu: bool,
                        requant: bool, has_bias: bool):
    """Resident dense GEMM: A tile + full-width int32 accumulator live in
    VMEM; B streams through in K-slabs.  Same architecture as the BSR
    resident kernel (and the reference's act_buffer/wgt-stream/
    output_accumulator split) — per-step work is tile_m x tile_k x N,
    large enough to hide all grid overhead."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_sl = a_ref[:, pl.ds(pl.multiple_of(c * tile_k, tile_k), tile_k)]
    acc_ref[:] += jax.lax.dot_general(
        a_sl, b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(c == k_chunks - 1)
    def _epilogue():
        acc = acc_ref[:]
        if has_bias:
            acc = acc + bias_ref[:].astype(jnp.int32)
        if relu:
            acc = jnp.maximum(acc, 0)
        if requant:
            scaled = acc.astype(jnp.float32) * fct_ref[:]
            o_ref[:] = jnp.clip(jnp.rint(scaled), -128, 127).astype(jnp.int8)
        else:
            o_ref[:] = acc


#: VMEM budget for the resident dense kernel (A + B slab + acc + out).
_MM_RESIDENT_VMEM_BUDGET = 12 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("relu", "requant", "tile_m", "tile_k", "interpret"))
def _matmul_int8_resident_padded(
    a, b, bias, factors, *,
    relu: bool, requant: bool,
    tile_m: int, tile_k: int,
    interpret: bool,
):
    """Resident-mode pallas_call on pre-padded operands."""
    M, K = a.shape
    _, N = b.shape
    k_chunks = K // tile_k
    out_dtype = jnp.int8 if requant else jnp.int32
    kernel = functools.partial(
        _mm_resident_kernel, k_chunks=k_chunks, tile_k=tile_k, relu=relu,
        requant=requant, has_bias=bias is not None)
    operands = [
        a, b,
        bias if bias is not None else jnp.zeros((1, N), jnp.int32),
        factors if factors is not None else jnp.ones((1, N), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(M // tile_m, k_chunks),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, N), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, N), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, N), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * (1 if requant else 4),
            transcendentals=0),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "requant", "tile_m", "tile_n", "tile_k",
                     "interpret"))
def _matmul_int8_pallas_padded(
    a, b, bias, factors, *,
    relu: bool, requant: bool,
    tile_m: int, tile_n: int, tile_k: int,
    interpret: bool,
):
    """Core pallas_call on pre-padded operands (all dims tile multiples)."""
    M, K = a.shape
    _, N = b.shape
    k_tiles = K // tile_k
    grid = (M // tile_m, N // tile_n, k_tiles)

    out_dtype = jnp.int8 if requant else jnp.int32
    kernel = functools.partial(
        _mm_kernel, k_tiles=k_tiles, relu=relu, requant=requant,
        has_bias=bias is not None)

    in_specs = [
        pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        # bias / factors broadcast along M: one (1, tile_n) row per j tile.
        pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [a, b]
    # Pallas needs concrete operands; feed zeros/ones when unused (they are
    # compiled away by the static has_bias/requant flags).
    operands.append(bias if bias is not None
                    else jnp.zeros((1, N), jnp.int32))
    operands.append(factors if factors is not None
                    else jnp.ones((1, N), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * (1 if requant else 4),
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def matmul_int8(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    factors: Optional[np.ndarray] = None,
    relu: bool = False,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k: int = 1024,
    backend: Optional[str] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """INT8 GEMM with optional fused bias + ReLU + requant epilogue.

    Args:
        a: [M, K] int8 activations.
        b: [K, N] int8 weights.
        bias: optional [N] int32 bias in the accumulator domain.
        factors: optional [N] (or scalar) float32 requant factors
            (epilogue.requant_factors).  When given, output is int8;
            otherwise raw int32 accumulators.
        relu: fuse ReLU on the int32 accumulator before requant.
        tile_*: Pallas grid tile sizes (clamped/padded to hardware tiling).
        use_pallas: route through the Pallas kernel (else pure XLA).

    Returns:
        [M, N] int8 (requant) or int32 (raw).
    """
    M, K = a.shape
    K2, N = b.shape
    if K != K2:
        raise ValueError(f"shape mismatch: A{a.shape} B{b.shape}")
    requant = factors is not None

    if not use_pallas:
        acc = matmul_int8_xla(a, b)
        if requant:
            return requantize(acc, factors, relu=relu, bias=bias)
        if bias is not None:
            acc = acc + bias.astype(jnp.int32)[None, :]
        if relu:
            acc = jnp.maximum(acc, 0)
        return acc

    # Clamp tiles to (padded) problem size; respect int8 (32,128) and
    # int32 (8,128) min tiles.
    tile_m = min(tile_m, round_up(M, 32))
    tile_n = min(tile_n, round_up(N, 128))
    tile_k = min(tile_k, round_up(K, 128))

    Mp, Kp, Np = (round_up(M, tile_m), round_up(K, tile_k),
                  round_up(N, tile_n))
    ap = jnp.pad(a, ((0, Mp - M), (0, Kp - K))) if (Mp, Kp) != (M, K) else a
    bp = jnp.pad(b, ((0, Kp - K), (0, Np - N))) if (Kp, Np) != (K, N) else b
    bias_p = None
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.int32), (0, Np - N)).reshape(1, Np)
    fct_p = None
    if requant:
        f = jnp.broadcast_to(
            jnp.asarray(factors, jnp.float32).reshape(-1), (N,))
        fct_p = jnp.pad(f, (0, Np - N)).reshape(1, Np)

    interpret = backend_mod.interpret_mode(backend)
    # Resident mode (A + accumulator in VMEM, B streamed) when it fits —
    # substantially faster (grid-step work scales with N).
    resident_bytes = (tile_m * Kp + tile_k * Np + 5 * tile_m * Np)
    if resident_bytes <= _MM_RESIDENT_VMEM_BUDGET:
        out = _matmul_int8_resident_padded(
            ap, bp, bias_p, fct_p,
            relu=relu, requant=requant,
            tile_m=tile_m, tile_k=tile_k,
            interpret=interpret)
    else:
        out = _matmul_int8_pallas_padded(
            ap, bp, bias_p, fct_p,
            relu=relu, requant=requant,
            tile_m=tile_m, tile_n=tile_n, tile_k=tile_k,
            interpret=interpret)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out
