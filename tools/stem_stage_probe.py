"""Ablation probe: where do the fused stem's 543 us actually go?

Round-5 measurements eliminated the two easy suspects (the M=64 dot
occupancy — stacked M=128 is slower; the staging DIVIDE — the exact
pow2-reciprocal multiply is time-neutral).  This probe decomposes the
kernel by ablation, timing-only (outputs are garbage for all but
``full``): identical grid/BlockSpecs/scratch, with stages knocked out:

- full:    the real kernel (ops/stem_fused.stem_conv_pool_nm).
- nodots:  staging (strided loads + quantize + merge + ring writes)
           kept; the 8 dots + pool + requant replaced by a ring slice
           copy to out.  ~= staging cost.
- nostage: staging body skipped entirely (ring holds zeros); dots +
           pool + requant + out writes kept.  ~= compute cost.
- nomerge: staging loads + quantize kept, but planes written to a
           56-sublane scratch instead of the (12, nq*128) lane-merged
           ring rows; dots kept (reading the zero ring).  full -
           nomerge ~= the sublane->lane merge + ring-write cost.
- fullbig / nostagebig: same as full / nostage but the output block is
           (1, 64, nq*128) written in ONE store per step instead of nq
           [64, 128] lane-block slices — full - fullbig ~= the cost of
           the 56-way out-write split (the consumer-side layout then
           changes, so adopting it needs an in-model relayout A/B).

Run: python tools/stem_stage_probe.py [N]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(N=128):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from resnet_accel_tpu.ops.conv import stem_s2d_weights
    from resnet_accel_tpu.ops.epilogue import requant_factors
    from resnet_accel_tpu.ops.stem_fused import RING, NEG
    from resnet_accel_tpu.quant import (bias_to_int32,
                                        quantize_symmetric_per_channel)
    from resnet_accel_tpu.ops import stem_fused
    from resnet_accel_tpu.runtime import xprof

    H = W = 224
    pooled, nq = H // 4, W // 4
    lanes = nq * 128
    scale = 0.03125

    def kernel(x_ref, wle_ref, whe_ref, wlo_ref, who_ref, b_ref, f_ref,
               out_ref, ring_a, ring_b, carry, plane_s, *, mode):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _init():
            ring_a[...] = jnp.zeros_like(ring_a)
            ring_b[...] = jnp.zeros_like(ring_b)

        def _stage_body():
          for li, r_off in ((0, -1), (1, 0)):
              planes_e, planes_o = [], []
              for c in range(3):
                  for rp in range(2):
                      for cp in range(2):
                          xe = x_ref[c, 0, 2 * li + rp, cp::4, :]
                          xo = x_ref[c, 0, 2 * li + rp, cp + 2::4, :]
                          qe = jnp.clip(jnp.rint(xe / jnp.float32(scale)),
                                        -128, 127).astype(jnp.int8)
                          qo = jnp.clip(jnp.rint(xo / jnp.float32(scale)),
                                        -128, 127).astype(jnp.int8)
                          planes_e.append(qe)
                          planes_o.append(qo)
              if mode == "nomerge":
                  # park the quantized planes sublane-shaped: no
                  # 56x128 -> 7168-lane merge, no ring writes
                  for pi in range(12):
                      plane_s[pl.ds(pi * 56, 56), 0:128] = planes_e[pi]
                      plane_s[pl.ds(pi * 56, 56), 128:256] = planes_o[pi]
                  continue
              e = jnp.stack(planes_e).reshape(12, lanes)
              o = jnp.stack(planes_o).reshape(12, lanes)
              slot = jax.lax.rem(2 * g + r_off + 2 * RING, RING)

              def put(s):
                  ring_a[pl.ds(s * 32, 12), 256:256 + lanes] = e
                  ring_a[pl.ds(s * 32 + 16, 12), 256:256 + lanes] = o
                  ring_b[pl.ds(s * 32, 12), 256:256 + lanes] = o
                  ring_b[pl.ds(s * 32 + 16, 12), 128:128 + lanes] = e

              put(slot)

              @pl.when(slot < 3)
              def _mirror():
                  put(slot + RING)

        if mode not in ("nostage", "nostagebig"):
            pl.when(g <= pooled)(_stage_body)

        @pl.when(g >= 2)
        def _compute():
            if mode == "nodots":
                out_ref[0, :, :, :] = ring_a[
                    pl.ds(0, 64), 128:128 + lanes].reshape(64, nq,
                                                           128).transpose(
                    1, 0, 2)
                return

            @pl.when(g == 2)
            def _first():
                carry[...] = jnp.full_like(carry, NEG)

            def colmax_of(h):
                first = jax.lax.rem(h - 2 + 2 * RING, RING)
                off_a = first * 32
                dus = (mode == "dus")
                acc_e = jax.lax.dot_general(
                    wle_ref[:], ring_a[pl.ds(off_a, 128),
                                       128:128 + lanes],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_e += jax.lax.dot_general(
                    whe_ref[:], ring_a[pl.ds(off_a, 128),
                                       256:256 + lanes],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_o = jax.lax.dot_general(
                    wlo_ref[:], ring_b[pl.ds(off_a, 128),
                                       0:128 + lanes],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_o += jax.lax.dot_general(
                    who_ref[:], ring_b[pl.ds(off_a, 128),
                                       128:256 + lanes],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if dus:
                    acc_o = jax.lax.dynamic_update_slice(
                        acc_o, jnp.full((64, 128), NEG, jnp.int32),
                        (0, 0))
                else:
                    t = jax.lax.broadcasted_iota(
                        jnp.int32, (64, 128 + lanes), 1)
                    acc_o = jnp.where(t < 128, jnp.int32(NEG), acc_o)
                return jnp.maximum(
                    jnp.maximum(acc_o[:, 0:lanes], acc_e),
                    acc_o[:, 128:128 + lanes])

            cm0 = colmax_of(2 * g - 4)
            cm1 = colmax_of(2 * g - 3)
            pooled_acc = jnp.maximum(jnp.maximum(carry[...], cm0), cm1)
            carry[...] = cm1
            acc = jnp.maximum(pooled_acc + b_ref[:, 0:1], 0)
            q8 = jnp.clip(jnp.rint(acc.astype(jnp.float32)
                                   * f_ref[:, 0:1]),
                          -128, 127).astype(jnp.int8)
            if mode in ("fullbig", "nostagebig"):
                out_ref[0, :, :] = q8
            else:
                for qb in range(nq):
                    out_ref[0, qb, :, :] = q8[:, qb * 128:(qb + 1)
                                              * 128]

    def build(mode):
        nq_rows = pooled

        def run(x, wle, whe, wlo, who, b2, f2):
            kern = functools.partial(kernel, mode=mode)
            lanes_ring = (nq + 2) * 128
            if mode in ("fullbig", "nostagebig"):
                out_spec = pl.BlockSpec(
                    (1, 64, nq * 128),
                    lambda b, g: (jnp.maximum(g - 2, 0), 0, b),
                    memory_space=pltpu.VMEM)
                out_shape = jax.ShapeDtypeStruct(
                    (pooled, 64, nq * N), jnp.int8)
            else:
                out_spec = pl.BlockSpec(
                    (1, nq, 64, 128),
                    lambda b, g: (jnp.maximum(g - 2, 0), 0, 0, b),
                    memory_space=pltpu.VMEM)
                out_shape = jax.ShapeDtypeStruct(
                    (pooled, nq, 64, N), jnp.int8)
            return pl.pallas_call(
                kern,
                grid=(N // 128, pooled + 2),
                in_specs=[
                    pl.BlockSpec((3, 1, 4, W, 128),
                                 lambda b, g: (0, jnp.minimum(g, nq_rows),
                                               0, 0, b),
                                 memory_space=pltpu.VMEM)] +
                [pl.BlockSpec((64, 128), lambda b, g: (0, 0),
                              memory_space=pltpu.VMEM)] * 4 +
                [pl.BlockSpec((64, 1), lambda b, g: (0, 0),
                              memory_space=pltpu.VMEM)] * 2,
                out_specs=out_spec,
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM(((RING + 3) * 32, lanes_ring), jnp.int8),
                    pltpu.VMEM(((RING + 3) * 32, lanes_ring), jnp.int8),
                    pltpu.VMEM((64, nq * 128), jnp.int32),
                    pltpu.VMEM((12 * 56, 256), jnp.int8),
                ],
            )(x, wle, whe, wlo, who, b2, f2)

        return run

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (N, 3, 224, 224)).astype(np.float32)
    xt = jnp.asarray(np.pad(x.transpose(1, 2, 3, 0),
                            ((0, 0), (2, 2), (0, 0), (0, 0))).reshape(
        3, pooled + 1, 4, W, N))
    w = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    wq, ws = quantize_symmetric_per_channel(w, axis=0)
    w2d = stem_s2d_weights(jnp.asarray(wq.reshape(64, -1)), 3, 7)
    wle, whe, wlo, who = stem_fused.pack_stem_weights(w2d)
    b2 = jnp.asarray(bias_to_int32(
        rng.normal(0, 0.5, 64).astype(np.float32), scale,
        ws)).reshape(64, 1)
    f2 = jnp.asarray(requant_factors(scale, ws, 0.05)).reshape(64, 1)

    modes = (sys.argv[2].split(",") if len(sys.argv) > 2 else
             ("full", "nodots", "nostage", "nomerge", "fullbig",
              "nostagebig"))
    for mode in modes:
        try:
            def fn(xx, mode=mode):
                with jax.named_scope("stem"):
                    return build(mode)(xx, wle, whe, wlo, who, b2, f2)
            np.asarray(jax.jit(fn)(xt))
            agg, _ = xprof.profile_layers(fn, xt)
            dev_us = sum(agg.values()) * 1e6
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"{mode:8s} {dev_us:7.1f} us device", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
