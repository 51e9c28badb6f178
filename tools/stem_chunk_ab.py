"""Kernel-level xprof A/B of the fused-stem formulations (real TPU).

Wall-clock timing of bare kernel calls through the tunnel is not
trustworthy at this scale (block_until_ready acks early; a 22 us
"median" under the ~125 us HBM floor was observed), so this measures
xprof DEVICE time of one dispatch per variant, plus on-chip
bit-exactness of every variant against the M=64 baseline.

Run: python tools/stem_chunk_ab.py [N]
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
    scale = 3.0 / 127.0
    b = jnp.asarray(bias_to_int32(
        rng.normal(0, 0.5, 64).astype(np.float32), scale, ws))
    f = jnp.asarray(requant_factors(scale, ws, 0.05))

    ref = None
    for name, kw in (("m64", dict(stacked=False)),
                     ("stacked-c4", dict(stacked=True, chunks=4)),
                     ("stacked-c2", dict(stacked=True, chunks=2)),
                     ("stacked-c8", dict(stacked=True, chunks=8))):
        try:
            def fn(xx, w2d=w2d, b=b, f=f, kw=kw):
                with jax.named_scope("stem"):
                    return stem_conv_pool_nm(xx, w2d, b, f, scale, **kw)
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
