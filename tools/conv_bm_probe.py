"""De-risk probe: batch-minor ring-staged 3x3 conv engine (real TPU).

The 64-channel stage-1 convs are the biggest remaining sink after the
pad-free stem (b0/b1 = 1072 us of 2697 at ~35% MXU util — the XLA
conv-emitter C_out=64 cap, docs/ARCHITECTURE.md).  This probes the
Mosaic formulation that the fused stem's machinery suggests:

- activations as batch-minor ROW VECTORS [64ch, W*128] (the stem's
  fullbig output layout — measured time-neutral to produce), so there
  is NO sublane->lane merge anywhere;
- a 4-slot row ring with 128-lane zero guards on both sides; kw taps
  become +-128-lane ref windows, kh taps ring slots;
- 9 dots [64,64] @ [64, W*128] per output row accumulating int32, then
  the bias/relu/requant epilogue (golden semantics) per row.

Checks bit-exactness vs the golden conv2d_int8 composition and xprof
device time vs the XLA emitter on the SAME int8 NCHW input.

Run: python tools/conv_bm_probe.py [N] [C] [H]
(C/H default 64/56 — the stage-1 geometry; 128/28 probes layer2.)
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RS = 4           # row ring: write slot g, read slots g-3..g-1 — disjoint


def main(N=128, C=64, H=56):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from resnet_accel_tpu.ops.conv import conv2d_int8
    from resnet_accel_tpu.runtime import xprof

    W = H
    lanes = W * 128
    gw = 128                      # zero guard lanes each side

    def kernel(x_ref, w_ref, b_ref, f_ref, out_ref, ring):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _init():
            ring[...] = jnp.zeros_like(ring)

        @pl.when(g < H)
        def _stage():
            slot = jax.lax.rem(g, RS)
            ring[pl.ds(slot * C, C), gw:gw + lanes] = x_ref[0]

        @pl.when(g == H)
        def _zero_bottom():
            z = jnp.zeros((C, ring.shape[1]), jnp.int8)
            ring[pl.ds((H % RS) * C, C), :] = z

        @pl.when(g >= 2)
        def _compute():
            h = g - 2
            acc = jnp.zeros((C, lanes), jnp.int32)
            for kh in range(3):
                sl = jax.lax.rem(h - 1 + kh + RS, RS)
                for kw in range(3):
                    acc += jax.lax.dot_general(
                        w_ref[kh * 3 + kw],
                        ring[pl.ds(sl * C, C),
                             kw * 128:kw * 128 + lanes],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            acc = jnp.maximum(acc + b_ref[:, 0:1], 0)
            q8 = jnp.clip(jnp.rint(acc.astype(jnp.float32)
                                   * f_ref[:, 0:1]),
                          -128, 127).astype(jnp.int8)
            out_ref[0] = q8

    def run(xr, w9, b2, f2):
        return pl.pallas_call(
            kernel,
            grid=(N // 128, H + 2),
            in_specs=[
                pl.BlockSpec((1, C, lanes),
                             lambda b, g: (jnp.minimum(g, H - 1), 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, C, C), lambda b, g: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 1), lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 1), lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, C, lanes),
                lambda b, g: (jnp.maximum(g - 2, 0), 0, b),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, C, N * W), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((RS * C, lanes + 2 * gw), jnp.int8),
            ],
        )(xr, w9, b2, f2)

    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (N, C, H, W)).astype(np.int8)
    w = rng.integers(-64, 64, (C, C, 3, 3)).astype(np.int8)
    bias = rng.integers(-8000, 8000, C).astype(np.int32)
    f = rng.uniform(0.001, 0.01, C).astype(np.float32)

    # row-vector view: (H, C, W*N) with lane index w*128 + n
    xr = jnp.asarray(np.ascontiguousarray(
        x.transpose(2, 1, 3, 0)).reshape(H, C, W * N))
    w9 = jnp.asarray(w.transpose(2, 3, 0, 1).reshape(9, C, C))
    b2 = jnp.asarray(bias).reshape(C, 1)
    f2 = jnp.asarray(f).reshape(C, 1)

    out = np.asarray(jax.jit(run)(xr, w9, b2, f2))
    got = out.reshape(H, C, W, N).transpose(3, 1, 0, 2)

    want = np.asarray(conv2d_int8(
        jnp.asarray(x), jnp.asarray(w.reshape(C, -1)),
        bias=jnp.asarray(bias), kernel=3, stride=1, padding=1,
        factors=jnp.asarray(f), relu=True, use_pallas=False,
        backend="cpu"))
    exact = np.array_equal(got, want)
    print(f"bit-exact vs golden: {exact} "
          f"({np.sum(got != want)}/{got.size} mismatches)", flush=True)

    agg, _ = xprof.profile_layers(lambda a: run(a, w9, b2, f2), xr)
    print(f"conv_bm kernel: {sum(agg.values()) * 1e6:7.1f} us device",
          flush=True)

    # XLA emitter on the same op (int8 in, fused epilogue)
    def xla_conv(a):
        return conv2d_int8(a, jnp.asarray(w.reshape(C, -1)),
                           bias=jnp.asarray(bias), kernel=3, stride=1,
                           padding=1, factors=jnp.asarray(f),
                           relu=True, use_pallas=False)
    agg, _ = xprof.profile_layers(xla_conv, jnp.asarray(x))
    print(f"xla emitter:    {sum(agg.values()) * 1e6:7.1f} us device",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64,
         int(sys.argv[3]) if len(sys.argv) > 3 else 56)
