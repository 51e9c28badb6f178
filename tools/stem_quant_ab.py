"""Kernel-level xprof A/B of the fused-stem STAGING variants (real TPU).

The round-5 stacked-formulation refutation left the stem's residual
467-vs-110 us gap attributed to the VPU staging chain (quantize +
parity split of the 77 MB fp32 input).  This measures the two staging
levers that chain allows without touching the bit-exact contract:

- ``inv``:   quantize by multiply with the exact power-of-two
             reciprocal (epilogue.exact_pow2_inv — bit-identical by
             construction, requires a pow2 input scale).
- ``block``: quantize each channel's whole [4, W, 128] block once into
             an int8 scratch, then run the 24 strided parity reads on
             int8 refs instead of slicing fp32 per (rp, cp) plane.

Like tools/stem_chunk_ab.py: xprof DEVICE time of one dispatch per
variant + on-chip bit-exactness vs the divide baseline (all variants
run the same pow2 scale, so every output must be bit-identical).

Run: python tools/stem_quant_ab.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(N=128):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from resnet_accel_tpu.ops.conv import stem_s2d_weights
    from resnet_accel_tpu.ops.epilogue import requant_factors
    from resnet_accel_tpu.ops.stem_fused import stem_conv_pool_nm
    from resnet_accel_tpu.quant import (bias_to_int32,
                                        quantize_symmetric_per_channel)
    from resnet_accel_tpu.runtime import xprof

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, 3, 224, 224)).astype(np.float32))
    w = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    wq, ws = quantize_symmetric_per_channel(w, axis=0)
    w2d = stem_s2d_weights(jnp.asarray(wq.reshape(64, -1)), 3, 7)
    scale = 0.03125            # 2^-5 ~ the 3/127 A/B scale, pow2
    b = jnp.asarray(bias_to_int32(
        rng.normal(0, 0.5, 64).astype(np.float32), scale, ws))
    f = jnp.asarray(requant_factors(scale, ws, 0.05))

    ref = None
    for name in ("div", "inv", "block", "block-inv"):
        try:
            def fn(xx, w2d=w2d, b=b, f=f, name=name):
                with jax.named_scope("stem"):
                    return stem_conv_pool_nm(xx, w2d, b, f, scale,
                                             quant_mode=name)
            out = np.asarray(jax.jit(fn)(x))
            if ref is None:
                ref = out
            exact = bool(np.array_equal(out, ref))
            agg, _ = xprof.profile_layers(fn, x)
            dev_us = sum(agg.values()) * 1e6
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"{name:12s} {dev_us:7.1f} us device  exact={exact}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
