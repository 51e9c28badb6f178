"""BSR sparse INT8 matmul on TPU — the zero-block-skipping datapath.

TPU-native realization of the reference's sparse engine:
- The bsr_scheduler FSM that walks row_ptr/col_idx and skips zero blocks
  entirely (hw/rtl/control/bsr_scheduler.sv:33-48,193-202) becomes a
  Pallas grid over (M-tiles x nnz_blocks) whose BlockSpec index maps read
  SCALAR-PREFETCHED col/row indices — the DMA engine gathers exactly the
  activation slabs the present blocks need, so wall-clock scales with
  nnz, not with the dense block grid.
- The meta_decode row_ptr/col_idx BRAM cache becomes the prefetched
  index arrays in SMEM.
- The output_accumulator's cross-K accumulation + fused ReLU/requant
  epilogue becomes an int32 VMEM scratch accumulator with the epilogue
  applied when the last block of an output row is consumed.

Orientation: C[M, N] = A[M, K] @ W^T with W[N, K] stored in BSR — the
exported-artifact orientation (data/bsr_export_14x14, golden_fc1_test.py).
Blocks are [block_h (N-dim), block_w (K-dim)].

Numerics: int8 x int8 -> int32; int32 accumulation is order-independent,
so this kernel is bit-exact vs golden.bsr_matmul_int8_wt for any block
size or visit order.

Two implementations behind one API:
- ``bsr_matmul_wt`` (Pallas): performance mode; block sizes should be
  MXU-friendly (block_h/block_w multiples of 128 ideally — use
  sparse.regroup to convert 14x14-block exports exactly).
- ``bsr_matmul_wt_xla``: gather-compact einsum; any block size, used for
  bit-exact replay of the reference's native 14x14 fixtures.
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
from resnet_accel_tpu.sparse.bsr import BSRMatrix


# --------------------------------------------------------------------------
# Host-side packing for the kernel
# --------------------------------------------------------------------------

@dataclasses.dataclass
class KernelBSR:
    """BSR repacked for the Pallas kernel (weights static at inference).

    Per-block flat arrays in CSR order; empty block-rows get one explicit
    all-zero block so every output tile is produced (the reference's
    scheduler skips empty rows because its accumulator was pre-zeroed;
    Pallas output tiles must be written, so we write-through a zero
    block instead).
    """

    blocks: jnp.ndarray      # [nnz_pad, block_w, block_h] int8 (pre-transposed)
    col_of: jnp.ndarray      # [nnz_pad] int32 — K-block index into A
    row_of: jnp.ndarray      # [nnz_pad] int32 — N-block index into C
    first_of: jnp.ndarray    # [nnz_pad] int32 — 1 on a row's first block
    last_of: jnp.ndarray     # [nnz_pad] int32 — 1 on a row's last block
    nnz: int                 # scheduled blocks (incl. fillers and padding)
    nnz_source: int          # true nonzero blocks in the source matrix
    total_source: int        # total blocks in the source block grid
    chunk: int               # blocks per resident-mode grid step
    block_h: int
    block_w: int
    n_out: int               # original (unpadded) N
    k_dim: int               # original (unpadded) K
    n_padded: int
    k_padded: int

    @property
    def real_nnz(self) -> int:
        return int(self.nnz)


def pack_kernel_bsr(bsr: BSRMatrix, chunk: int = 8) -> KernelBSR:
    """Prepare a BSRMatrix (W[N,K] orientation) for the Pallas kernel.

    ``chunk``: blocks per grid step in resident mode (the schedule is
    zero-padded to a multiple of it).
    """
    if bsr.data.dtype != np.int8:
        raise ValueError("kernel BSR requires int8 blocks")
    bh, bw = bsr.block_h, bsr.block_w
    nbr = bsr.num_block_rows

    blocks_list, col_of, row_of, first, last = [], [], [], [], []
    data = np.asarray(bsr.data)
    rp = np.asarray(bsr.row_ptr)
    ci = np.asarray(bsr.col_idx)
    zero_block = np.zeros((bw, bh), dtype=np.int8)

    for br in range(nbr):
        lo, hi = int(rp[br]), int(rp[br + 1])
        if hi == lo:
            # Empty row: schedule one zero block so the output tile exists.
            blocks_list.append(zero_block)
            col_of.append(0)
            row_of.append(br)
            first.append(1)
            last.append(1)
            continue
        for j, idx in enumerate(range(lo, hi)):
            blocks_list.append(np.ascontiguousarray(data[idx].T))
            col_of.append(int(ci[idx]))
            row_of.append(br)
            first.append(1 if j == 0 else 0)
            last.append(1 if idx == hi - 1 else 0)

    # Pad the schedule to a multiple of the chunk size with zero blocks
    # (zero weights contribute nothing; flags 0/0 keep them out of the
    # stream-mode zero/epilogue logic).
    pad = -len(blocks_list) % chunk
    for _ in range(pad):
        blocks_list.append(zero_block)
        col_of.append(0)
        row_of.append(0)
        first.append(0)
        last.append(0)

    blocks = np.stack(blocks_list) if blocks_list else \
        np.zeros((0, bw, bh), np.int8)
    return KernelBSR(
        blocks=jnp.asarray(blocks),
        col_of=jnp.asarray(np.asarray(col_of, np.int32)),
        row_of=jnp.asarray(np.asarray(row_of, np.int32)),
        first_of=jnp.asarray(np.asarray(first, np.int32)),
        last_of=jnp.asarray(np.asarray(last, np.int32)),
        nnz=len(blocks_list),
        nnz_source=bsr.nnz_blocks,
        total_source=bsr.total_blocks,
        chunk=chunk,
        block_h=bh,
        block_w=bw,
        n_out=bsr.shape[0],
        k_dim=bsr.shape[1],
        n_padded=bsr.padded_shape[0],
        k_padded=bsr.padded_shape[1],
    )


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def _bsr_kernel(col_ref, row_ref, first_ref, last_ref, a_ref, w_ref,
                bias_ref, fct_ref, o_ref, acc_ref, *, relu: bool,
                requant: bool, has_bias: bool):
    """One grid step consumes one nonzero block for one M tile.

    Grid is (m_tiles, nnz) with blocks in CSR order, so all blocks of an
    output row are consecutive: zero the accumulator on the row's first
    block, write the epilogue on its last.  Pallas keeps o_ref resident in
    VMEM while the output index (mt, row_of[b]) is unchanged.
    """
    b = pl.program_id(1)
    is_first = first_ref[b] == 1
    is_last = last_ref[b] == 1

    @pl.when(is_first)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # [TM, BW] @ [BW, BH] -> [TM, BH] on the MXU, int32 accumulate
    # (blocks stored pre-transposed at pack time: no in-kernel transpose).
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(is_last)
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


def _bsr_resident_kernel(col_ref, row_ref, first_ref, last_ref, a_ref,
                         w_ref, bias_ref, fct_ref, o_ref, acc_ref, *,
                         chunk: int,
                         n_chunks: int, bw: int, bh: int, relu: bool,
                         requant: bool, has_bias: bool):
    """Resident mode: one grid step consumes a CHUNK of blocks.

    This is the reference's architecture mapped 1:1 onto VMEM:
    - the full activation tile stays resident in VMEM (act_buffer),
    - weight blocks stream through in chunks (bsr_dma's block stream),
    - a full-width int32 accumulator tile absorbs every block at its
      (row, col) offset (output_accumulator), epilogue once at the end.

    Because int32 accumulation is order-independent, no first/last flags
    are needed — blocks land wherever their row says, in any order, and
    padded zero blocks are harmless.  Amortizes grid-step overhead over
    ``chunk`` MXU matmuls and keeps A traffic at one DMA per M-tile.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for g in range(chunk):
        b = c * chunk + g
        col = col_ref[b]
        row = row_ref[b]
        a_sl = a_ref[:, pl.ds(pl.multiple_of(col * bw, bw), bw)]
        part = jax.lax.dot_general(
            a_sl, w_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        off = pl.multiple_of(row * bh, bh)
        acc_ref[:, pl.ds(off, bh)] += part

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


#: VMEM budget for resident mode (A tile + int32 acc + out tile), bytes.
_RESIDENT_VMEM_BUDGET = 12 * 1024 * 1024


def bsr_matmul_wt(
    a: jnp.ndarray,
    kbsr: KernelBSR,
    *,
    bias: Optional[jnp.ndarray] = None,
    factors: Optional[np.ndarray] = None,
    relu: bool = False,
    tile_m: int = 512,
    mode: str = "auto",
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Sparse C[M, N] = A[M, K] @ W^T via the Pallas zero-skip kernel.

    ``mode``: "resident" (A + accumulator tiles live in VMEM, weights
    stream — fastest when N/K tiles fit VMEM), "stream" (per-block grid
    with gathered A slabs — any size), or "auto".

    Args:
        a: [M, K] int8 activations (K may be unpadded; zero-padded here).
        kbsr: packed weights (pack_kernel_bsr).
        bias: [N] int32 accumulator-domain bias.
        factors: [N] or scalar float32 requant factors -> int8 output.
        relu: fused ReLU on int32 accumulators.

    Returns:
        [M, n_out] int8 (requant) or int32.
    """
    M, K = a.shape
    if K not in (kbsr.k_dim, kbsr.k_padded):
        raise ValueError(f"A has K={K}, BSR expects {kbsr.k_dim} "
                         f"(padded {kbsr.k_padded})")
    bh, bw = kbsr.block_h, kbsr.block_w
    requant = factors is not None

    tile_m = min(tile_m, round_up(M, 32))
    Mp = round_up(M, tile_m)
    Kp = kbsr.k_padded
    Np = kbsr.n_padded
    ap = jnp.pad(a, ((0, Mp - M), (0, Kp - K))) if (Mp, Kp) != (M, K) else a

    bias_p = jnp.zeros((1, Np), jnp.int32)
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.int32),
                         (0, Np - kbsr.n_out)).reshape(1, Np)
    fct_p = jnp.ones((1, Np), jnp.float32)
    if requant:
        f = jnp.broadcast_to(
            jnp.asarray(factors, jnp.float32).reshape(-1), (kbsr.n_out,))
        fct_p = jnp.pad(f, (0, Np - kbsr.n_out)).reshape(1, Np)

    interpret = backend_mod.interpret_mode(backend)
    out_dtype = jnp.int8 if requant else jnp.int32
    m_tiles = Mp // tile_m
    nnz = kbsr.nnz

    if mode == "auto":
        resident_bytes = tile_m * Kp + 5 * tile_m * Np \
            + 2 * kbsr.chunk * bw * bh
        mode = "resident" if resident_bytes <= _RESIDENT_VMEM_BUDGET \
            else "stream"
    if mode not in ("resident", "stream"):
        raise ValueError(f"unknown mode {mode!r}")

    if mode == "resident":
        chunk = kbsr.chunk
        n_chunks = nnz // chunk
        kernel = functools.partial(
            _bsr_resident_kernel, chunk=chunk, n_chunks=n_chunks,
            bw=bw, bh=bh, relu=relu, requant=requant,
            has_bias=bias is not None)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(m_tiles, n_chunks),
            in_specs=[
                # Full activation tile resident in VMEM (act_buffer).
                pl.BlockSpec((tile_m, Kp),
                             lambda mt, c, col, row, fst, lst: (mt, 0),
                             memory_space=pltpu.VMEM),
                # Streaming chunk of pre-transposed blocks (bsr_dma).
                pl.BlockSpec((chunk, bw, bh),
                             lambda mt, c, col, row, fst, lst: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Np),
                             lambda mt, c, col, row, fst, lst: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Np),
                             lambda mt, c, col, row, fst, lst: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, Np),
                                   lambda mt, c, col, row, fst, lst: (mt, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tile_m, Np), jnp.int32)],
        )
    else:
        kernel = functools.partial(
            _bsr_kernel, relu=relu, requant=requant,
            has_bias=bias is not None)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(m_tiles, nnz),
            in_specs=[
                # A slab: gathered by the block's K index (act_dma gather).
                pl.BlockSpec((tile_m, bw),
                             lambda mt, b, col, row, fst, lst: (mt, col[b]),
                             memory_space=pltpu.VMEM),
                # The block itself (compacted weight stream, like bsr_dma).
                pl.BlockSpec((1, bw, bh),
                             lambda mt, b, col, row, fst, lst: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bh),
                             lambda mt, b, col, row, fst, lst: (0, row[b]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bh),
                             lambda mt, b, col, row, fst, lst: (0, row[b]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, bh),
                                   lambda mt, b, col, row, fst, lst:
                                   (mt, row[b]),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tile_m, bh), jnp.int32)],
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * nnz * bh * bw,
            bytes_accessed=nnz * (bh * bw + tile_m * bw) + Mp * Np,
            transcendentals=0),
        interpret=interpret,
    )(kbsr.col_of, kbsr.row_of, kbsr.first_of, kbsr.last_of,
      ap, kbsr.blocks, bias_p, fct_p)

    return out[:M, :kbsr.n_out]


# --------------------------------------------------------------------------
# XLA gather-compact path (bit-exact replay for any block size, e.g. 14x14)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class GatherBSR:
    """BSR repacked as rectangular gather-compact arrays for XLA.

    Per block-row, the present blocks are padded to Lmax (max blocks per
    row) with zero blocks (gather index 0 — contribution is zero), turning
    the ragged CSR walk into a dense einsum of size ~ padded-nnz.
    """

    blocks: jnp.ndarray      # [nbr, Lmax, bh, bw] int8
    gather_idx: jnp.ndarray  # [nbr, Lmax] int32 (K-block indices)
    lmax: int
    block_h: int
    block_w: int
    n_out: int
    k_dim: int
    n_padded: int
    k_padded: int


def pack_gather_bsr(bsr: BSRMatrix) -> GatherBSR:
    if bsr.data.dtype != np.int8:
        raise ValueError("gather BSR requires int8 blocks")
    bh, bw = bsr.block_h, bsr.block_w
    nbr = bsr.num_block_rows
    rp = np.asarray(bsr.row_ptr)
    ci = np.asarray(bsr.col_idx)
    counts = np.diff(rp)
    lmax = max(int(counts.max()) if counts.size else 0, 1)

    blocks = np.zeros((nbr, lmax, bh, bw), dtype=np.int8)
    gidx = np.zeros((nbr, lmax), dtype=np.int32)
    for br in range(nbr):
        lo, hi = int(rp[br]), int(rp[br + 1])
        n = hi - lo
        if n:
            blocks[br, :n] = np.asarray(bsr.data)[lo:hi]
            gidx[br, :n] = ci[lo:hi]
    return GatherBSR(
        blocks=jnp.asarray(blocks), gather_idx=jnp.asarray(gidx),
        lmax=lmax, block_h=bh, block_w=bw,
        n_out=bsr.shape[0], k_dim=bsr.shape[1],
        n_padded=bsr.padded_shape[0], k_padded=bsr.padded_shape[1])


def bsr_matmul_wt_xla(a: jnp.ndarray, g: GatherBSR) -> jnp.ndarray:
    """C[M, n_out] = A @ W^T via gather + einsum, int32, bit-exact.

    Work scales with nbr*Lmax (padded nnz), so zero-block skipping
    materializes as wall-clock even in pure XLA.  Used for exact replay of
    the reference's 14x14-block artifacts whose blocks are too small for
    the MXU-tiled Pallas kernel.
    """
    M, K = a.shape
    if K < g.k_padded:
        a = jnp.pad(a, ((0, 0), (0, g.k_padded - K)))
    ab = a.reshape(M, g.k_padded // g.block_w, g.block_w)
    # Gather the K-slabs each block needs: [M, nbr, Lmax, bw]
    ag = jnp.take(ab, g.gather_idx.reshape(-1), axis=1)
    ag = ag.reshape(M, g.gather_idx.shape[0], g.lmax, g.block_w)
    # Contract: sum over (Lmax, bw) -> [M, nbr, bh]
    out = jnp.einsum(
        "mrlw,rlhw->mrh",
        ag.astype(jnp.int32), g.blocks.astype(jnp.int32),
        preferred_element_type=jnp.int32)
    return out.reshape(M, -1)[:, :g.n_out]
