"""On-chip A/B of the pad-free + CHWN-ingest fused stem (real TPU).

The stem_stage_probe decomposition put ~110 us of the in-model stem
scope in XLA's transpose+pad pre-op.  This measures the whole jitted
dispatch (pre-op included, xprof device time) for:

- nchw-pad:      the shipping round-4 path (transpose+pad copy).
- nchw-padfree:  pad-free schedule, transpose copy remains.
- chwn-pad:      batch-minor ingest, pad copy remains.
- chwn-padfree:  batch-minor ingest + pad-free schedule — no pre-op.

Every variant is asserted BIT-IDENTICAL to the shipping path on the
same data.  The output-relayout artifact of standalone dispatch is the
same for all variants, so deltas here are the pre-op deltas.

Run: python tools/stem_padfree_ab.py [N]
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
    xn = rng.normal(0, 1, (N, 3, 224, 224)).astype(np.float32)
    x = jnp.asarray(xn)
    xc = jnp.asarray(xn.transpose(1, 2, 3, 0))
    w = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    wq, ws = quantize_symmetric_per_channel(w, axis=0)
    w2d = stem_s2d_weights(jnp.asarray(wq.reshape(64, -1)), 3, 7)
    scale = 3.0 / 127.0
    b = jnp.asarray(bias_to_int32(
        rng.normal(0, 0.5, 64).astype(np.float32), scale, ws))
    f = jnp.asarray(requant_factors(scale, ws, 0.05))

    ref = None
    for name, kw, xx in (
            ("nchw-pad", dict(), x),
            ("nchw-padfree", dict(padfree=True), x),
            ("chwn-pad", dict(input_layout="CHWN"), xc),
            ("chwn-padfree", dict(input_layout="CHWN", padfree=True),
             xc)):
        try:
            def fn(xi, kw=kw):
                with jax.named_scope("stem"):
                    return stem_conv_pool_nm(xi, w2d, b, f, scale, **kw)
            out = np.asarray(jax.jit(fn)(xx))
            if ref is None:
                ref = out
            exact = bool(np.array_equal(out, ref))
            agg, _ = xprof.profile_layers(fn, xx)
            dev_us = sum(agg.values()) * 1e6
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"{name:14s} {dev_us:7.1f} us device  exact={exact}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
