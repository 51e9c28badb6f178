"""On-device BSR packing — jittable dense -> block-sparse compaction.

The host packers (sparse.bsr, native/) run at export time.  For serving
flows where weights land on the device dense (e.g. streamed from a
training job) the pack itself can run on the TPU: block-norm scan,
nonzero-block indexing and block gathering are all expressible with
static shapes by fixing an upper bound on blocks-per-row (``lmax``) —
``jnp.nonzero(size=...)`` gives the fixed-size index set, and a validity
mask zeroes the gathered filler blocks so they contribute nothing.

The result is consumable directly by ops.bsr_matmul.bsr_matmul_wt_xla
(the gather-einsum zero-skip path) and is bit-exact with the host pack.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from resnet_accel_tpu.config import round_up
from resnet_accel_tpu.ops.bsr_matmul import GatherBSR


@functools.partial(jax.jit, static_argnames=("block_h", "block_w", "lmax"))
def _pack_arrays(w, *, block_h: int, block_w: int, lmax: int):
    n, k = w.shape
    np_, kp = round_up(n, block_h), round_up(k, block_w)
    wp = jnp.pad(w, ((0, np_ - n), (0, kp - k)))
    nbr, nbc = np_ // block_h, kp // block_w
    tiles = wp.reshape(nbr, block_h, nbc, block_w).transpose(0, 2, 1, 3)
    nz = jnp.any(tiles != 0, axis=(2, 3))                 # [nbr, nbc]

    def row_pack(nz_row, tiles_row):
        (idx,) = jnp.nonzero(nz_row, size=lmax, fill_value=0)
        count = jnp.sum(nz_row.astype(jnp.int32))
        valid = jnp.arange(lmax) < count
        blocks = tiles_row[idx]                           # [lmax, bh, bw]
        blocks = jnp.where(valid[:, None, None], blocks, 0)
        gidx = jnp.where(valid, idx, 0).astype(jnp.int32)
        return blocks, gidx, count

    blocks, gidx, counts = jax.vmap(row_pack)(nz, tiles)
    return blocks, gidx, counts


def device_pack_gather(
    w2d: jnp.ndarray,
    block_h: int,
    block_w: Optional[int] = None,
    lmax: Optional[int] = None,
) -> GatherBSR:
    """Pack a dense int8 weight matrix [N, K] into GatherBSR on device.

    ``lmax`` bounds nonzero blocks per block-row (defaults to the dense
    maximum — set it lower when the sparsity level is known to cut the
    gather-path work proportionally).  Rows with more nonzero blocks than
    ``lmax`` would be silently truncated, so the bound is validated on
    the host side of the returned counts when this runs eagerly.
    """
    if w2d.dtype != jnp.int8:
        raise ValueError("device pack expects int8 weights")
    if block_w is None:
        block_w = block_h
    n, k = w2d.shape
    nbc = round_up(k, block_w) // block_w
    if lmax is None:
        lmax = nbc
    lmax = min(lmax, nbc)

    blocks, gidx, counts = _pack_arrays(
        w2d, block_h=block_h, block_w=block_w, lmax=lmax)
    if int(jnp.max(counts)) > lmax:
        raise ValueError(
            f"lmax={lmax} too small: a block-row has {int(jnp.max(counts))} "
            f"nonzero blocks")
    return GatherBSR(
        blocks=blocks,
        gather_idx=gidx,
        lmax=lmax,
        block_h=block_h,
        block_w=block_w,
        n_out=n,
        k_dim=k,
        n_padded=round_up(n, block_h),
        k_padded=round_up(k, block_w),
    )
