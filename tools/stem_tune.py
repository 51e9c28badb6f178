"""On-chip tuning sweep for the quantize+s2d nm stem kernel.

    python tools/stem_tune.py

Times quantize_s2d_nm in isolation at ResNet ImageNet geometry for a
range of per-step H-tile sizes (the _pick_ht budget), plus the XLA
composition baseline, and the full forward at batch 128 vs 256.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from resnet_accel_tpu.ops import stem_pack
    from resnet_accel_tpu.runtime.perf import median_pair_time

    N, C, H, W = 128, 3, 224, 224
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, C, H, W)).astype(np.float32))
    scale = 0.0312

    def time_fn(fn, label):
        @jax.jit
        def loop1(a):
            return fn(a)[0, 0, 0, 0]

        @jax.jit
        def loopn(a):
            def body(i, c):
                return c + fn(a * (1.0 + c * 1e-30))[0, 0, 0, 0]
            return jax.lax.fori_loop(0, 16, body, jnp.int8(0))

        _ = np.asarray(loop1(x)); _ = np.asarray(loopn(x))
        t = median_pair_time(lambda a: loop1(a), lambda a: loopn(a),
                             x, 16, 9) * 1e6
        print(f"{label:32s} {t:8.1f} us", flush=True)
        return t

    # XLA composition baseline
    time_fn(lambda a: stem_pack.quantize_s2d_nchw(a, scale), "xla quantize+s2d")

    # nm kernel at various ht (grid tiles)
    def nm_ht(a, ht, kernel=None):
        xt = a.transpose(1, 2, 3, 0).reshape(C, H // 2, 2, W, N)
        kern = functools.partial(kernel or stem_pack._kernel_nm,
                                 scale=float(scale))
        out = pl.pallas_call(
            kern,
            grid=(H // ht,),
            in_specs=[pl.BlockSpec((C, ht // 2, 2, W, N),
                                   lambda i: (0, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ht // 2, W // 2, 4 * C, N),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // 2, W // 2, 4 * C, N),
                                           jnp.int8),
        )(xt)
        return out.transpose(3, 2, 0, 1)

    # correctness gate for the bitcast variant before timing it
    ref = np.asarray(jax.jit(
        lambda a: stem_pack.quantize_s2d_nchw(a, scale))(x))
    got = np.asarray(jax.jit(
        lambda a: nm_ht(a, 8, stem_pack._kernel_nm_bc))(x))
    ok = np.array_equal(ref, got)
    print(f"nm_bc bit-exact vs XLA composition: {ok}", flush=True)

    for ht in (4, 8, 16):
        for name, kern in (("nm", stem_pack._kernel_nm),
                           ("nm_bc", stem_pack._kernel_nm_bc)):
            try:
                time_fn(lambda a, h=ht, k=kern: nm_ht(a, h, k),
                        f"{name} kernel ht={ht}")
            except Exception as e:
                print(f"{name} kernel ht={ht}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
