"""One-pass fused ImageNet stem: quantize + s2d + 4x4 conv + 3x3/s2
maxpool + requant, entirely in VMEM.

The stem complex is the measured throughput ceiling of the INT8
ResNet forward (docs/ARCHITECTURE.md: nm staging 246 us + 4x4 conv
373 us at 27% MXU util + pool 102 us at batch 128 — XLA's conv
emitter caps C_out=64 at half the MXU lanes and the 205 MB pre-pool
int32/int8 activation round-trips through HBM).  This kernel keeps
the pre-pool activation in VMEM and reformulates the conv so the MXU
runs near-full:

- Batch-minor GEMMs: lanes = (output column q, batch n) so every dot
  is [64|128, 128] @ [128, W/4*128] with ALL 128 lanes live.
- W-parity staging: the s2d image's columns are staged as (E, O)
  parity planes in two ring buffers (ringA for even output columns,
  ringB holding (O[j], E[j+1]) for odd ones), so every kw tap becomes
  a LANE-BLOCK-shifted window of one staged matrix — no im2col.
- kh rides the K dimension: a conv row's window is 4 consecutive ring
  slots = one contiguous 128-sublane dot operand (the ring is
  partially mirrored so mod-RING windows never wrap; verified
  bit-exact on chip, tools/stem_ring_probe.py).  The compute lags the
  staging by two grid steps, so a step's MXU dots never touch the
  ring groups its VPU is writing — scheduler-overlappable.
- The 3x3/s2 maxpool and the requantize COMMUTE (relu + positive
  per-channel factor is monotone in the int32 accumulator, the
  fused_stem.py identity), so pooling runs in int32 on conv rows as
  they are produced — one carried colmax row per step — and only the
  POOLED [N,64,56,56] tensor is requantized and written to HBM.

HBM traffic: read the fp32 input once (77 MB at batch 128), write the
pooled int8 output once (26 MB) — nothing else.  Output layout is the
batch-minor {0,1,3,2} activation layout XLA's conv emitter wants next
(the quantize_s2d_nm contract), so no relayout copies appear around
the custom call.

Bit-exactness contract (tested, tests/test_stem_fused.py):
    quantize_s2d_nm(x, s) -> conv2d_int8(kernel=4, stride=1,
    padding=((2,1),(2,1)), relu=True) -> maxpool2d_int8(3, 2, pad=1)
per the reference semantics: golden requantize
(/root/reference/hw/sim/cpp/src/golden_models.cpp:378-410), 7x7/s2
stem + 3x3/s2 pool geometry (resnet_inference.cpp stem stage).

Mosaic constraints shaping the code (probed on chip, round 4):
out-of-range BlockSpec index maps crash the device (never rely on
clamping); int8 vector max does not legalize (pool in int32);
value-level strided slices lower to unsupported gathers (stride the
REF reads); sublane->lane merge reshapes are legal on values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 7                      # lag-2 pipeline: rows 2g-6..2g live per step
RING_PF = 8      # pad-free schedule: stage rows 2g,2g+1 / compute rows
                 # 2g-4,2g-3 (same lag-2) — reads cover rows 2g-6..2g-2
                 # which are mod-8 disjoint from the step's writes, so
                 # ring 8 keeps staging data-disjoint from live dots
NEG = -(2 ** 30)   # pool pad: never wins, +bias can't wrap (py int:
                   # a module-level jnp scalar would be a captured
                   # constant, which pallas kernels reject)


def pack_stem_weights(w2d, dtype=jnp.int8):
    """[64, 192] s2d stem weight (K order (c,rp,cp) x kh x kw, the
    ops.conv.stem_s2d_weights contract) -> four [64, 128] dot matrices.

    K layout per matrix: sublane 32*i + ch is s2d row (h-2+i), channel
    ch, E-half; 32*i + 16 + ch the O-half — matching the ring staging.
      W_le/W_he: even output columns, lo window (kw 0/1), hi (kw 2/3).
      W_lo/W_ho: odd columns via ringB's (O[j], E[j+1]) interleave:
                 lo = (kw0 on O, kw1 on E), hi = (kw2 on O, kw3 on E).
    """
    w4 = jnp.asarray(w2d).reshape(-1, 12, 4, 4)
    O = w4.shape[0]
    z = jnp.zeros((O, 4, 4), w4.dtype)    # 4 pad channels per half

    def half(kw):                          # [O, 4kh, 16]
        return jnp.concatenate([w4[:, :, :, kw].transpose(0, 2, 1),
                                z], axis=2)

    def mat(kw_a, kw_b):                   # A on rows 0-15, B on 16-31
        m = jnp.concatenate([half(kw_a), half(kw_b)], axis=2)
        return m.reshape(O, 128).astype(dtype)

    return (mat(0, 1), mat(2, 3),          # even: (E,O) x (lo,hi)
            mat(0, 1), mat(2, 3))          # odd: (O,E+1) x (lo,hi)


def pack_stem_weights_stacked(w2d, dtype=jnp.int8):
    """Row-stacked dot matrices: both conv rows of a grid step in ONE
    [128, 160] operand so the dot fills all 128 MXU rows (the M=64
    half-occupancy was the measured cap of the round-4 kernel,
    docs/ARCHITECTURE.md).

    Conv row 2p+1's 4-slot tap window is row 2p's shifted one ring
    slot (32 sublanes), so against a FIVE-slot staged window
    [off, off+160) the stacked weight is block-shift-diagonal:
    channels 0-63 (row 2p) carry the taps at sublanes 0-127, channels
    64-127 (row 2p+1) the same taps at sublanes 32-159.
    """
    mats = pack_stem_weights(w2d, dtype)
    z = jnp.zeros((64, 32), dtype)
    return tuple(jnp.concatenate(
        [jnp.concatenate([m, z], axis=1),
         jnp.concatenate([z, m], axis=1)], axis=0) for m in mats)


def _kernel(x_ref, wle_ref, whe_ref, wlo_ref, who_ref, b_ref, f_ref,
            out_ref, ring_a, ring_b, carry, *scratch, nq: int,
            pooled: int, scale: float, stacked: bool, chunks: int = 4,
            inv_scale=None, block_q: bool = False, pf: bool = False,
            ring: int = RING, rowvec: bool = False):
    """Grid (batch_slabs, pooled+2).  Step g stages s2d rows 2g-1 and
    2g; the compute runs TWO steps behind (p = g-2: conv rows 2p and
    2p+1, int32 colmax pool fold, pooled row p) so the dots only read
    ring groups staged in EARLIER steps — the staging VPU work and the
    MXU dots of a step are data-disjoint and can overlap.

    ``pf`` (pad-free): same grid, same lag-2, over the UNPADDED input
    — step g stages s2d rows 2g, 2g+1 (image rows 4g..4g+3 = exactly
    input block g, so no XLA pad copy is needed).  The top halo (s2d
    rows -2, -1) reads the zero-initialized ring slots before any
    staging reaches them; the bottom phantom row 2·pooled gets its
    slot (and mirror) explicitly zeroed at step g == pooled, after its
    last real writer and before its only reader.  ``ring`` must be
    RING_PF: a step's reads (rows 2g-6..2g-2) and writes (2g, 2g+1)
    are mod-8 disjoint, preserving the staging/compute overlap."""
    g = pl.program_id(1)
    lanes = nq * 128
    qbuf = scratch[0] if scratch else None

    def _q(v):
        # inv_scale is only ever passed with a host-side exactness
        # proof (power-of-two scale: x*2^k == x/2^-k bit-for-bit, see
        # epilogue.exact_pow2_inv) — the golden contract stays rint of
        # the quotient either way.
        if inv_scale is not None:
            r = jnp.rint(v * jnp.float32(inv_scale))
        else:
            r = jnp.rint(v / jnp.float32(scale))
        return jnp.clip(r, -128, 127).astype(jnp.int8)

    @pl.when(g == 0)
    def _init():
        ring_a[...] = jnp.zeros_like(ring_a)
        ring_b[...] = jnp.zeros_like(ring_b)

    # ---- stage s2d rows r = 2g-1, 2g (image rows 4g-2 .. 4g+1, which
    # are padded rows 4g .. 4g+3 = this step's input block; the final
    # lag step has nothing new to stage) --------------------------------
    def _stage_body():
      if block_q:
          # Quantize each channel's whole [4, W, 128] input block ONCE
          # into an int8 scratch, then run the 24 strided parity reads
          # on int8 refs.  Measured round 5: Mosaic rejects this —
          # "Strided load with non 32-bit data" — so the mode is kept
          # only for interpret-mode study; the shipped kernel strides
          # the fp32 ref and quantizes per plane.
          for c in range(3):
              qbuf[pl.ds(4 * c, 4)] = _q(x_ref[c, 0])
      for li, r_off in ((0, -1), (1, 0)):
          planes_e, planes_o = [], []
          for c in range(3):
              for rp in range(2):
                  for cp in range(2):
                      # s2d col u = image col 2u + cp: E (u even) is
                      # image cols cp::4, O (u odd) is cp+2::4
                      if block_q:
                          qe = qbuf[4 * c + 2 * li + rp, cp::4, :]
                          qo = qbuf[4 * c + 2 * li + rp, cp + 2::4, :]
                      else:
                          qe = _q(x_ref[c, 0, 2 * li + rp, cp::4, :])
                          qo = _q(x_ref[c, 0, 2 * li + rp,
                                        cp + 2::4, :])
                      planes_e.append(qe)
                      planes_o.append(qo)
          e = jnp.stack(planes_e).reshape(12, lanes)
          o = jnp.stack(planes_o).reshape(12, lanes)
          row = 2 * g + r_off + (1 if pf else 0)
          slot = jax.lax.rem(row + 2 * ring, ring)

          def put(s):
              # ringA block j+2 = (E[j], O[j])
              ring_a[pl.ds(s * 32, 12), 256:256 + lanes] = e
              ring_a[pl.ds(s * 32 + 16, 12), 256:256 + lanes] = o
              # ringB: O[j] at block j+2, E[j] at block j+1
              ring_b[pl.ds(s * 32, 12), 256:256 + lanes] = o
              ring_b[pl.ds(s * 32 + 16, 12), 128:128 + lanes] = e

          put(slot)
          # Partial mirror: a 4-group window (5 stacked) starting at
          # slot <= ring-1 reaches at most slot ring+2 (ring+3), so
          # only slots 0-2 (0-3) need the +ring copy — (ring+3)/(ring+4)
          # groups instead of 2*ring keeps the kernel inside the 16 MB
          # scoped-VMEM limit.

          @pl.when(slot < (4 if stacked else 3))
          def _mirror():
              put(slot + ring)

    pl.when(g <= (pooled - 1 if pf else pooled))(_stage_body)

    if pf:
        # phantom bottom s2d row 2*pooled: its slot was last written by
        # row 2*pooled - ring; zero it (and its mirror — windows that
        # reach it always read through the mirror groups) before conv
        # row 2*pooled - 1 consumes it as zero padding.
        zs = (2 * pooled) % ring

        @pl.when(g == pooled)
        def _zero_phantom():
            z = jnp.zeros((32, ring_a.shape[1]), jnp.int8)
            ring_a[pl.ds(zs * 32, 32), :] = z
            ring_b[pl.ds(zs * 32, 32), :] = z
            if zs < 3:
                ring_a[pl.ds((zs + ring) * 32, 32), :] = z
                ring_b[pl.ds((zs + ring) * 32, 32), :] = z

    lag = 2

    # ---- conv rows + pool fold ---------------------------------------
    @pl.when(g >= lag)
    def _compute():
        @pl.when(g == lag)
        def _first():
            carry[...] = jnp.full_like(carry, NEG)  # conv row -1 = pad

        def colmax_of(h):
            """Conv row h as (even, odd-extended) dots, folded to the
            3-tap column max of the pool, int32 [64, nq*128]."""
            first = jax.lax.rem(h - 2 + 2 * ring, ring)
            off_a = first * 32
            acc_e = jax.lax.dot_general(
                wle_ref[:], ring_a[pl.ds(off_a, 128), 128:128 + lanes],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_e += jax.lax.dot_general(
                whe_ref[:], ring_a[pl.ds(off_a, 128), 256:256 + lanes],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # odd columns, extended one block left (t = 0 is the
            # phantom column -1, masked below)
            acc_o = jax.lax.dot_general(
                wlo_ref[:], ring_b[pl.ds(off_a, 128), 0:128 + lanes],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_o += jax.lax.dot_general(
                who_ref[:], ring_b[pl.ds(off_a, 128),
                                   128:256 + lanes],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t = jax.lax.broadcasted_iota(
                jnp.int32, (64, 128 + lanes), 1)
            acc_o = jnp.where(t < 128, jnp.int32(NEG), acc_o)
            return jnp.maximum(
                jnp.maximum(acc_o[:, 0:lanes], acc_e),
                acc_o[:, 128:128 + lanes])

        if stacked:
            # Both conv rows in ONE M=128 dot per (parity, kw-half):
            # channels 0-63 = row 2p (taps at sublanes 0-127 of the
            # 5-slot window), 64-127 = row 2p+1 (taps at 32-159).
            # The lane axis is processed in chunks with the pool fold
            # and requant applied per chunk, so only ONE chunk's int32
            # accumulators are ever live — the full-width [128, lanes]
            # accs of a naive formulation blow the scoped-VMEM budget
            # (caught by tools/aot_check.py, round 5).
            first = jax.lax.rem(2 * (g - lag) - 2 + 2 * ring, ring)
            off = first * 32
            nch = chunks if nq % chunks == 0 else (
                4 if nq % 4 == 0 else (2 if nq % 2 == 0 else 1))
            nq2 = nq // nch
            ln = nq2 * 128
            for ci in range(nch):
                lo = ci * ln
                acc_e = jax.lax.dot_general(
                    wle_ref[:],
                    ring_a[pl.ds(off, 160), 128 + lo:128 + lo + ln],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_e += jax.lax.dot_general(
                    whe_ref[:],
                    ring_a[pl.ds(off, 160), 256 + lo:256 + lo + ln],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_o = jax.lax.dot_general(
                    wlo_ref[:],
                    ring_b[pl.ds(off, 160), lo:lo + 128 + ln],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_o += jax.lax.dot_general(
                    who_ref[:],
                    ring_b[pl.ds(off, 160),
                           128 + lo:128 + lo + 128 + ln],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if ci == 0:
                    # phantom column -1 of the odd extension
                    t = jax.lax.broadcasted_iota(
                        jnp.int32, (128, 128 + ln), 1)
                    acc_o = jnp.where(t < 128, jnp.int32(NEG), acc_o)
                cm = jnp.maximum(
                    jnp.maximum(acc_o[:, 0:ln], acc_e),
                    acc_o[:, 128:128 + ln])       # [128, ln]
                cm0, cm1 = cm[0:64], cm[64:128]
                pooled_acc = jnp.maximum(
                    jnp.maximum(carry[:, lo:lo + ln], cm0), cm1)
                carry[:, lo:lo + ln] = cm1
                acc = jnp.maximum(pooled_acc + b_ref[:, 0:1], 0)
                q8 = jnp.clip(jnp.rint(acc.astype(jnp.float32)
                                       * f_ref[:, 0:1]),
                              -128, 127).astype(jnp.int8)
                for qb in range(nq2):
                    out_ref[0, ci * nq2 + qb, :, :] = \
                        q8[:, qb * 128:(qb + 1) * 128]
            return

        cm0 = colmax_of(2 * (g - lag))      # conv row 2p
        cm1 = colmax_of(2 * (g - lag) + 1)  # conv row 2p+1
        pooled_acc = jnp.maximum(jnp.maximum(carry[...], cm0), cm1)
        carry[...] = cm1

        acc = pooled_acc + b_ref[:, 0:1]
        acc = jnp.maximum(acc, 0)
        q8 = jnp.clip(jnp.rint(acc.astype(jnp.float32)
                               * f_ref[:, 0:1]),
                      -128, 127).astype(jnp.int8)
        if rowvec:
            out_ref[0] = q8
        else:
            for qb in range(nq):
                out_ref[0, qb, :, :] = q8[:, qb * 128:(qb + 1) * 128]


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "stacked",
                                    "chunks", "quant_mode",
                                    "input_layout", "padfree",
                                    "out_layout", "kernel_interpret"))
def stem_conv_pool_nm(x: jnp.ndarray, w2d: jnp.ndarray,
                      bias: jnp.ndarray, factors: jnp.ndarray,
                      scale: float,
                      interpret: bool = False,
                      stacked: bool = False,
                      chunks: int = 4,
                      quant_mode: str = "auto",
                      input_layout: str = "NCHW",
                      padfree=None,
                      out_layout: str = "nchw",
                      kernel_interpret: bool = False) -> jnp.ndarray:
    """[N, 3, H, W] fp32 -> [N, 64, H/4, W/4] int8: the whole ImageNet
    stem complex in one HBM pass (see module docstring).

    ``w2d``: [64, 192] s2d stem weight (stem_s2d_weights output),
    ``bias``: int32 [64], ``factors``: fp32 [64] requant factors,
    ``scale``: input quantization scale.  Requires N % 128 == 0 and
    H % 4 == W % 4 == 0 (the throughput geometry); callers fall back
    to the unfused path otherwise (models.resnet18.make_forward).

    ``stacked=True`` computes both conv rows of a step in one M=128
    dot per (parity, kw-half) against a 5-slot staged window — all 128
    MXU rows live.  Measured on chip (round 5, tools/stem_chunk_ab.py
    + tools/route_tune.py): it is 13-16% SLOWER than the M=64
    formulation (615.7 vs 543.0 us bare-kernel device time; in-model
    stem 541 vs 467 us) at every legal lane-chunk count (``chunks``;
    c2 exceeds scoped VMEM), because the block-shift-diagonal weight
    pads K 128->160 — 25% real MXU K-cycles — and the 160-sublane
    windows defeat Mosaic's aligned-read paths.  The MXU row
    occupancy named as the round-4 cap is therefore NOT the binding
    constraint.  ``stacked=False`` (M=64) is the default and the
    shipped route; stacked is kept behind the ``fused-stacked``
    route for A/B measurement.

    ``padfree`` (default: on unless ``stacked``) uses the pad-free
    staging schedule (see ``_kernel``): the XLA pad copy that
    materialized the padded batch-minor input disappears, and with it
    the whole pre-op — a pure transpose (NCHW) propagates into the
    parameter layout instead of copying.  Measured on chip at batch
    128: 543.0 -> 432.6 us standalone, bit-identical
    (tools/stem_padfree_ab.py).  ``input_layout="CHWN"`` additionally
    takes ``x`` as [3, H, W, N] — already batch-minor, the kernel's
    native staging layout — so production ingest can upload straight
    into the kernel's layout.  Both knobs are bit-exact: same
    arithmetic, same output.

    In interpret mode (CPU) the identical arithmetic runs as the
    reference composition — the kernel is TPU-layout-specific.
    ``kernel_interpret=True`` instead runs the PALLAS KERNEL ITSELF
    under the interpreter (hermetic lowering-structure check; slow,
    test-only).
    """
    if input_layout not in ("NCHW", "CHWN"):
        raise ValueError(f"unknown input_layout {input_layout!r}")
    chwn = input_layout == "CHWN"
    if chwn:
        C, H, W, N = x.shape
    else:
        N, C, H, W = x.shape
    if C != 3 or N == 0 or N % 128 or H % 4 or W % 4:
        raise ValueError(f"unsupported stem geometry N={N} C={C} "
                         f"H={H} W={W}")
    if padfree is None:
        padfree = not stacked
    if padfree and stacked:
        raise ValueError("padfree does not support the stacked route")
    if out_layout not in ("nchw", "rowvec"):
        raise ValueError(f"unknown out_layout {out_layout!r}")
    if out_layout == "rowvec" and stacked:
        raise ValueError("rowvec output not wired for the stacked "
                         "route")
    if interpret:
        from resnet_accel_tpu.ops.conv import conv2d_int8
        from resnet_accel_tpu.ops.pooling import maxpool2d_int8
        from resnet_accel_tpu.ops.stem_pack import quantize_s2d_nm
        if chwn:
            x = x.transpose(3, 0, 1, 2)
        s = quantize_s2d_nm(x, scale, interpret=True)
        a = conv2d_int8(s, w2d, bias=bias, kernel=4, stride=1,
                        padding=((2, 1), (2, 1)), factors=factors,
                        relu=True, use_pallas=False, backend="cpu")
        a = maxpool2d_int8(a, 3, 2, padding=1)
        if out_layout == "rowvec":
            from resnet_accel_tpu.ops.conv_bm import rowvec_of_nchw
            a = rowvec_of_nchw(a)
        return a

    pooled, nq = H // 4, W // 4
    slabs = N // 128
    xt = x if chwn else x.transpose(1, 2, 3, 0)   # [3, H, W, N]
    if padfree:
        # pure reshape — H = 4*pooled exactly, no pad, no copy
        xt = xt.reshape(3, pooled, 4, W, N)
    else:
        # 2-row zero pad top/bottom (conv rows -2/-1 and the bottom
        # halo quantize from literal zeros = the conv's zero pad)
        xt = jnp.pad(xt, ((0, 0), (2, 2), (0, 0), (0, 0)))
        xt = xt.reshape(3, pooled + 1, 4, W, N)

    if stacked:
        wle, whe, wlo, who = pack_stem_weights_stacked(w2d)
        wdim, ext = (128, 160), 4
    else:
        wle, whe, wlo, who = pack_stem_weights(w2d)
        wdim, ext = (64, 128), 3
    b2 = jnp.asarray(bias, jnp.int32).reshape(64, 1)
    f2 = jnp.asarray(factors, jnp.float32).reshape(64, 1)

    if quant_mode not in ("auto", "div", "inv", "block",
                          "block-inv"):
        raise ValueError(f"unknown quant_mode {quant_mode!r}")
    from resnet_accel_tpu.ops.epilogue import exact_pow2_inv
    inv = exact_pow2_inv(scale)
    if quant_mode == "auto":
        # The pow2-reciprocal multiply is bit-identical by construction
        # (exact_pow2_inv) and never slower than the divide; use it
        # whenever the calibrated scale permits.  The int8 block-split
        # modes are NOT auto-selected: Mosaic has no sub-32-bit strided
        # load (measured round 5, tools/stem_quant_ab.py).
        quant_mode = "inv" if inv is not None else "div"
    if quant_mode.endswith("inv") and inv is None:
        raise ValueError(
            f"quant_mode={quant_mode!r} needs a power-of-two scale "
            f"(got {scale!r}); see epilogue.exact_pow2_inv")
    inv_scale = inv if quant_mode.endswith("inv") else None
    block_q = quant_mode.startswith("block")

    ring = RING_PF if padfree else RING
    lag = 2
    nq_rows = pooled - 1 if padfree else pooled   # last input group
    rowvec = out_layout == "rowvec"
    kern = functools.partial(_kernel, nq=nq, pooled=pooled,
                             scale=float(scale), stacked=stacked,
                             chunks=chunks, inv_scale=inv_scale,
                             block_q=block_q, pf=padfree, ring=ring,
                             rowvec=rowvec)
    lanes_ring = (nq + 2) * 128
    out = pl.pallas_call(
        kern,
        grid=(slabs, pooled + lag),
        in_specs=[
            pl.BlockSpec((3, 1, 4, W, 128),
                         lambda b, g: (0, jnp.minimum(g, nq_rows), 0,
                                       0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wdim, lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wdim, lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wdim, lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wdim, lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 64, nq * 128),
            lambda b, g: (jnp.maximum(g - lag, 0), 0, b),
            memory_space=pltpu.VMEM) if rowvec else pl.BlockSpec(
            (1, nq, 64, 128),
            lambda b, g: (jnp.maximum(g - lag, 0), 0, 0, b),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (pooled, 64, nq * N), jnp.int8) if rowvec else
        jax.ShapeDtypeStruct((pooled, nq, 64, N), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM(((ring + ext) * 32, lanes_ring), jnp.int8),
            pltpu.VMEM(((ring + ext) * 32, lanes_ring), jnp.int8),
            pltpu.VMEM((64, nq * 128), jnp.int32),
        ] + ([pltpu.VMEM((12, W, 128), jnp.int8)] if block_q else []),
        interpret=kernel_interpret,
    )(xt, wle, whe, wlo, who, b2, f2)
    if rowvec:
        return out                        # (H', 64, W'*N) row vectors
    return out.transpose(3, 2, 0, 1)      # NCHW view, batch-minor phys
