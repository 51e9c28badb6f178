"""De-risk probes for the fused-stem kernel's ring design.

1. ring_dot: dot operand = DYNAMIC sublane-offset window of a VMEM
   scratch ring (offset = 32 * (program_id % 6)), two shifted-window
   dots accumulated — the exact read pattern the fused kernel needs.
   Checks correctness against numpy, not just compilation.
2. epilogue: colmax + requant (int32 -> int8 rint/clip) + int8 row-max
   + lane-block-shifted max on [64, L] planes — per-step cost of the
   pool/requant epilogue at realistic sizes.

Run: python tools/stem_ring_probe.py   (needs the TPU tunnel)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from resnet_accel_tpu.runtime.perf import median_pair_time  # noqa: E402

L = 57 * 128
RING = 6


def ring_dot_correct():
    """Grid fills a [RING*32, L+128] int8 ring one 32-group per step,
    then dots W_lo @ ring[dyn:dyn+128, 0:L] + W_hi @ ring[dyn:dyn+128,
    128:L+128] once 4 groups exist; checks values."""
    G = 8

    def kern(x_ref, wlo_ref, whi_ref, o_ref, ring_ref):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, RING)
        ring_ref[pl.ds(slot * 32, 32), :] = x_ref[0]
        # mirror for contiguity
        ring_ref[pl.ds((slot + RING) * 32, 32), :] = x_ref[0]

        @pl.when(g >= 3)
        def _():
            # window = groups g-3..g (contiguous via mirror)
            first = jax.lax.rem(g - 3, RING)
            off = first * 32
            win_lo = ring_ref[pl.ds(off, 128), 0:L]
            win_hi = ring_ref[pl.ds(off, 128), 128:L + 128]
            acc = jax.lax.dot_general(
                wlo_ref[:], win_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += jax.lax.dot_general(
                whi_ref[:], win_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[0] = acc

    rng = np.random.default_rng(0)
    x = rng.integers(-4, 4, (G, 32, L + 128)).astype(np.int8)
    wlo = rng.integers(-4, 4, (64, 128)).astype(np.int8)
    whi = rng.integers(-4, 4, (64, 128)).astype(np.int8)
    out = pl.pallas_call(
        kern, grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 32, L + 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 64, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2 * RING * 32, L + 128), jnp.int8)],
    )(jnp.asarray(x), jnp.asarray(wlo), jnp.asarray(whi))
    out = np.asarray(out)
    # golden for g = 4: window groups 1..4
    for g in (3, 4, 7):
        win = np.concatenate(
            [x[g - 3 + j] for j in range(4)], axis=0).astype(np.int32)
        want = wlo.astype(np.int32) @ win[:, 0:L] \
            + whi.astype(np.int32) @ win[:, 128:L + 128]
        np.testing.assert_array_equal(out[g], want, err_msg=f"g={g}")
    print("PASS  ring_dot dynamic sublane-window dots bit-exact")


def epilogue_cost():
    """Per-step cost of the pool/requant epilogue: int32 colmax with
    lane-block shifts, +bias, relu, f32 scale, rint, clip -> int8,
    int8 3-row max.  Slope between 1x and 3x epilogues per step."""
    STEPS = 112

    def build(neps):
        def kern(c_ref, e_ref, o_ref, f_ref, out_ref):
            res = None
            for i in range(neps):
                ei = e_ref[:] + i            # [64, L+128] int32
                oi = o_ref[:]
                colmax = jnp.maximum(
                    jnp.maximum(oi[:, 0:L], ei[:, 128:L + 128]),
                    oi[:, 128:L + 128])
                # int8 vector max does not legalize (arith.maxsi on i8)
                # so the 3-row pool max stays in int32 pre-requant.
                res = colmax if res is None else jnp.maximum(res, colmax)
            acc = jnp.maximum(res, 0)
            q = jnp.clip(jnp.rint(acc.astype(jnp.float32)
                                  * f_ref[:, 0:1]), -128, 127
                         ).astype(jnp.int8)
            out_ref[:] = q[0:8, 0:128].astype(jnp.int32) + c_ref[0, 0]

        rng = np.random.default_rng(0)
        e = jnp.asarray(rng.integers(-9999, 9999, (64, L + 128)),
                        jnp.int32)
        o = jnp.asarray(rng.integers(-9999, 9999, (64, L + 128)),
                        jnp.int32)
        f = jnp.asarray(rng.uniform(0.001, 0.01, (64, 1)), jnp.float32)
        fc = pl.pallas_call(
            kern, grid=(STEPS,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] + [
                pl.BlockSpec(x.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for x in (e, o, f)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
        c0 = jnp.zeros((8, 128), jnp.int32)

        def mk(nn):
            @jax.jit
            def loop(c):
                return jax.lax.fori_loop(
                    0, nn, lambda i, cc: fc(cc, e, o, f), c)[0, 0]
            return loop
        return mk, c0

    mk1, c0 = build(1)
    t1 = median_pair_time(mk1(1), mk1(16), c0, 16, 7)
    mk3, c0 = build(3)
    t3 = median_pair_time(mk3(1), mk3(16), c0, 16, 7)
    per = (t3 - t1) / (2 * STEPS)
    print(f"epilogue (colmax+requant+int8max on [64,{L}]): "
          f"{per*1e6:6.2f} us each; 1x step {t1/STEPS*1e6:5.2f} us")


def staging_cost():
    """Per-step cost of the quantize + stride-4 parity slice + stack +
    sublane->lane merge-reshape + ring store pipeline (the fused
    kernel's staging path for TWO s2d rows)."""
    STEPS = 56

    def build(nrows):
        def kern(c_ref, x_ref, o_ref, ring_ref):
            g = pl.program_id(0)
            for li in range(nrows):          # one s2d row each
                planes_e, planes_o = [], []
                for c in range(3):
                    for rp in range(2):
                        for cp in range(2):
                            # strides on the REF (value-level strided
                            # slices lower to unsupported gathers)
                            xe = x_ref[0, c, 2 * li + rp,
                                       2 * cp::4, :]       # [56,128] f32
                            xo = x_ref[0, c, 2 * li + rp,
                                       2 * cp + 1::4, :]
                            planes_e.append(jnp.clip(
                                jnp.rint(xe / np.float32(0.02)),
                                -128, 127).astype(jnp.int8))
                            planes_o.append(jnp.clip(
                                jnp.rint(xo / np.float32(0.02)),
                                -128, 127).astype(jnp.int8))
                e = jnp.stack(planes_e).reshape(12, 56 * 128)
                o = jnp.stack(planes_o).reshape(12, 56 * 128)
                slot = jax.lax.rem(g + li, jnp.int32(6))
                ring_ref[pl.ds(slot * 32, 12), 128:56 * 128 + 128] = e
                ring_ref[pl.ds(slot * 32 + 16, 12),
                         128:56 * 128 + 128] = o
            o_ref[:] = ring_ref[0:8, 0:128].astype(jnp.int32) \
                + c_ref[0, 0]

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 3, 4, 224, 128)),
                        jnp.float32)
        fc = pl.pallas_call(
            kern, grid=(STEPS,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 3, 4, 224, 128),
                                   lambda i: (0, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((192, 57 * 128), jnp.int8)])
        c0 = jnp.zeros((8, 128), jnp.int32)

        def mk(nn):
            @jax.jit
            def loop(c):
                return jax.lax.fori_loop(
                    0, nn, lambda i, cc: fc(cc, x), c)[0, 0]
            return loop
        return mk, c0

    mk1, c0 = build(1)
    t1 = median_pair_time(mk1(1), mk1(16), c0, 16, 7)
    mk2, c0 = build(2)
    t2 = median_pair_time(mk2(1), mk2(16), c0, 16, 7)
    per = (t2 - t1) / STEPS
    print(f"staging (quantize+slice+merge+store, 1 s2d row): "
          f"{per*1e6:6.2f} us; 1-row step {t1/STEPS*1e6:5.2f} us")


if __name__ == "__main__":
    print(jax.devices())
    ring_dot_correct()
    epilogue_cost()
    staging_cost()
