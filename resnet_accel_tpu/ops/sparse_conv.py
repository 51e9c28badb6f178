"""Fused-gather sparse INT8 convolution — zero-skip without im2col.

The plain sparse-conv lowering (explicit im2col -> BSR GEMM) is bitwise
correct but loses to the dense native conv: materializing the patch
tensor costs k*k times the input's HBM traffic.  This kernel removes
that cost by keeping the (padded, NHWC) input tile RESIDENT in VMEM and
taking each weight block's patch slab as an in-VMEM slice:

  - weights are BSR over the (kh, kw, c) flattening of [O, C, kh, kw]:
    one block = `block_c` consecutive input channels at a single kernel
    tap (kh, kw) x `block_o` output channels.  With C % block_c == 0 a
    block never straddles a tap boundary, so its activation slab is the
    contiguous strided window  x[:, kh:kh+Ho, kw:kw+Wo, c0:c0+block_c].
  - per-block metadata (kh, kw, c-block, o-block) rides in scalar-
    prefetched SMEM arrays (the meta_decode role), and each grid step
    consumes a chunk of blocks into a full-width int32 VMEM accumulator
    (the output_accumulator role), epilogue once at the end.
  - Mosaic requires dynamic offsets on the sublane (width) dim to be
    8-aligned, so the host pre-shifts the padded input into
    ``kernel * stride`` phase planes: plane (kw, kh % stride) holds the
    stride-downsampled input at that column tap / row phase, so inside
    the kernel the tap (kh, kw) becomes a dynamic *untiled* plane index
    plus a contiguous row slice at offset kh // stride — the width
    slice stays static whatever the stride.

Zero blocks are simply absent from the schedule: wall-clock scales with
nnz like the GEMM kernel, and the input is read from HBM exactly once
per image tile.  Any stride >= 1 is supported (stride-s planes are a
factor s^2 smaller, so stride-2 HALVES the resident footprint vs the
k stride-1 copies); the single restriction is C % block_c == 0, where
the model layer falls back to dense native conv.

Bit-exactness: int8 x int8 -> int32 accumulation over the same products
as golden conv2d_int8_simple — order-independent, so exact.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnet_accel_tpu.config import round_up
from resnet_accel_tpu.runtime import backend as backend_mod


@dataclasses.dataclass
class ConvBSR:
    """Block-sparse conv weights packed for the fused-gather kernel."""

    blocks: jnp.ndarray     # [nnz_pad, block_c, block_o] int8 (transposed)
    kh_of: jnp.ndarray      # [nnz_pad] int32
    kw_of: jnp.ndarray      # [nnz_pad] int32
    c_of: jnp.ndarray       # [nnz_pad] int32 (channel-block index)
    o_of: jnp.ndarray       # [nnz_pad] int32 (output-block index)
    nnz: int                # scheduled blocks (incl. padding)
    nnz_source: int         # true nonzero blocks
    total_source: int
    chunk: int
    kernel: int
    padding: int
    c_in: int
    c_out: int
    block_c: int
    block_o: int

    @property
    def sparsity(self) -> float:
        return 1.0 - self.nnz_source / self.total_source


def pack_conv_bsr(
    w4d: np.ndarray,
    padding: int,
    block_o: int = 128,
    block_c: Optional[int] = None,
    chunk: int = 8,
) -> ConvBSR:
    """Pack int8 conv weights [O, C, kh, kw] into tap-aligned BSR blocks.

    A block is zero (skipped) iff all its block_o x block_c weights at
    one (kh, kw) tap are zero — e.g. after block pruning of the
    (kh,kw,c)-flattened weight matrix.
    """
    w4d = np.asarray(w4d, np.int8)
    O, C, KH, KW = w4d.shape
    if block_c is None:
        block_c = min(C, 128)
    if C % block_c:
        raise ValueError(f"C={C} not a multiple of block_c={block_c}")
    block_o_eff = min(block_o, round_up(O, 8))
    Op = round_up(O, block_o_eff)
    if Op != O:
        w4d = np.concatenate(
            [w4d, np.zeros((Op - O, C, KH, KW), np.int8)], axis=0)

    n_ob, n_cb = Op // block_o_eff, C // block_c
    blocks, khs, kws, cbs, obs = [], [], [], [], []
    nnz_source = 0
    for kh in range(KH):
        for kw in range(KW):
            for cb in range(n_cb):
                for ob in range(n_ob):
                    blk = w4d[ob * block_o_eff:(ob + 1) * block_o_eff,
                              cb * block_c:(cb + 1) * block_c, kh, kw]
                    if not np.any(blk):
                        continue
                    nnz_source += 1
                    # store transposed [block_c, block_o] for a plain
                    # slab @ block MXU matmul
                    blocks.append(np.ascontiguousarray(blk.T))
                    khs.append(kh)
                    kws.append(kw)
                    cbs.append(cb)
                    obs.append(ob)
    total = KH * KW * n_cb * n_ob
    # Pad schedule to the chunk size with zero blocks.
    pad = -len(blocks) % chunk if blocks else chunk
    for _ in range(pad):
        blocks.append(np.zeros((block_c, block_o_eff), np.int8))
        khs.append(0)
        kws.append(0)
        cbs.append(0)
        obs.append(0)
    return ConvBSR(
        blocks=jnp.asarray(np.stack(blocks)),
        kh_of=jnp.asarray(np.asarray(khs, np.int32)),
        kw_of=jnp.asarray(np.asarray(kws, np.int32)),
        c_of=jnp.asarray(np.asarray(cbs, np.int32)),
        o_of=jnp.asarray(np.asarray(obs, np.int32)),
        nnz=len(blocks),
        nnz_source=nnz_source,
        total_source=total,
        chunk=chunk,
        kernel=KH,
        padding=padding,
        c_in=C,
        c_out=O,
        block_c=block_c,
        block_o=block_o_eff,
    )


def _sconv_kernel(row_ref, pln_ref, cb_ref, ob_ref, x_ref, w_ref, bias_ref,
                  fct_ref, o_ref, acc_ref, *, chunk: int, n_chunks: int,
                  ho: int, wo: int, block_c: int, block_o: int,
                  relu: bool, requant: bool, has_bias: bool):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for g in range(chunk):
        b = c * chunk + g
        row = row_ref[b]
        pln = pln_ref[b]
        c0 = cb_ref[b] * block_c
        o0 = pl.multiple_of(ob_ref[b] * block_o, block_o)
        # The block's activation slab: [ti, Ho, Wo, block_c] window of
        # the tap's phase plane (plane index and row offset encode the
        # (kh, kw, stride) tap; both land on untiled dims, the width
        # slice is static).
        slab = x_ref[pln, :, pl.ds(row, ho), :,
                     pl.ds(pl.multiple_of(c0, block_c), block_c)]
        ti = slab.shape[0]
        a2 = slab.reshape(ti * ho * wo, block_c)
        part = jax.lax.dot_general(
            a2, w_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:, pl.ds(o0, block_o)] += part

    @pl.when(c == n_chunks - 1)
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


def sparse_conv2d_int8(
    x: jnp.ndarray,
    cbsr: ConvBSR,
    *,
    bias: Optional[jnp.ndarray] = None,
    factors: Optional[np.ndarray] = None,
    relu: bool = False,
    stride: int = 1,
    img_tile: int = 8,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Fused-gather zero-skip conv: [N, C, H, W] int8 -> [N, O, Ho, Wo].

    Any ``stride`` >= 1: the input is decomposed into ``kernel * stride``
    stride-downsampled phase planes so every tap is a contiguous in-VMEM
    slice (see module docstring).
    """
    N, C, H, W = x.shape
    if C != cbsr.c_in:
        raise ValueError(f"input C={C}, weights expect {cbsr.c_in}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    k, p, s = cbsr.kernel, cbsr.padding, stride
    Ho = (H + 2 * p - k) // s + 1
    Wo = (W + 2 * p - k) // s + 1
    rows_pl = (k - 1) // s + Ho      # rows per phase plane
    n_planes = k * s
    requant = factors is not None

    # Auto-shrink the image tile until the VMEM working set fits:
    # k*s phase planes (double-buffered) + int32 accumulator + output.
    Op_ = round_up(cbsr.c_out, cbsr.block_o)
    budget = 10 * 1024 * 1024
    img_tile = min(img_tile, N)
    while img_tile > 1:
        rows_ = img_tile * Ho * Wo
        need = (2 * n_planes * img_tile * rows_pl * Wo * C
                + rows_ * Op_ * 4
                + 2 * rows_ * Op_ * (1 if requant else 4)
                + 2 * cbsr.chunk * cbsr.block_c * cbsr.block_o)
        if need <= budget:
            break
        img_tile //= 2
    Np_img = round_up(N, img_tile)
    # NCHW -> padded NHWC (channel-minor so channel blocks are lanes),
    # then one stride-downsampled plane per (kw, kh % s) tap phase so
    # both tap coordinates index untiled dims in the kernel.
    xh = jnp.transpose(x, (0, 2, 3, 1))
    xh = jnp.pad(xh, ((0, Np_img - N), (p, p), (p, p), (0, 0)))
    planes = []
    for kw in range(k):
        for ph in range(s):
            pp = xh[:, ph::s, kw::s, :][:, :rows_pl, :Wo, :]
            planes.append(jnp.pad(
                pp, ((0, 0), (0, rows_pl - pp.shape[1]),
                     (0, Wo - pp.shape[2]), (0, 0))))
    xsh = jnp.stack(planes, axis=0)
    # Per-block tap -> (plane, row) schedule (host-side numpy on the
    # packed constants; stride is a call-time property of the layer).
    kh_np = np.asarray(cbsr.kh_of)
    kw_np = np.asarray(cbsr.kw_of)
    pln_of = jnp.asarray((kw_np * s + kh_np % s).astype(np.int32))
    row_of = jnp.asarray((kh_np // s).astype(np.int32))

    Op = round_up(cbsr.c_out, cbsr.block_o)
    bias_p = jnp.zeros((1, Op), jnp.int32)
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.int32),
                         (0, Op - cbsr.c_out)).reshape(1, Op)
    fct_p = jnp.ones((1, Op), jnp.float32)
    if requant:
        f = jnp.broadcast_to(
            jnp.asarray(factors, jnp.float32).reshape(-1), (cbsr.c_out,))
        fct_p = jnp.pad(f, (0, Op - cbsr.c_out)).reshape(1, Op)

    n_chunks = cbsr.nnz // cbsr.chunk
    out_dtype = jnp.int8 if requant else jnp.int32

    kernel = functools.partial(
        _sconv_kernel, chunk=cbsr.chunk, n_chunks=n_chunks, ho=Ho, wo=Wo,
        block_c=cbsr.block_c, block_o=cbsr.block_o, relu=relu,
        requant=requant, has_bias=bias is not None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Np_img // img_tile, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (n_planes, img_tile, rows_pl, Wo, C),
                lambda it, c, kh, kw, cb, ob: (0, it, 0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cbsr.chunk, cbsr.block_c, cbsr.block_o),
                lambda it, c, kh, kw, cb, ob: (c, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Op), lambda it, c, kh, kw, cb, ob: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Op), lambda it, c, kh, kw, cb, ob: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (img_tile * Ho * Wo, Op),
            lambda it, c, kh, kw, cb, ob: (it, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((img_tile * Ho * Wo, Op), jnp.int32)],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (Np_img * Ho * Wo, Op), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np_img * Ho * Wo * cbsr.nnz * cbsr.block_c
            * cbsr.block_o // (Np_img // img_tile),
            bytes_accessed=Np_img * (H + 2 * p) * (W + 2 * p) * C
            + cbsr.nnz * cbsr.block_c * cbsr.block_o,
            transcendentals=0),
        interpret=backend_mod.interpret_mode(backend),
    )(row_of, pln_of, cbsr.c_of, cbsr.o_of,
      xsh, cbsr.blocks, bias_p, fct_p)

    out = out.reshape(Np_img, Ho, Wo, Op)[:N, :, :, :cbsr.c_out]
    return jnp.transpose(out, (0, 3, 1, 2))
