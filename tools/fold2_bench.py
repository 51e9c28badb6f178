"""On-chip benchmark for the row-pair-folded stem conv+pool.

The ResNet ImageNet stem after space-to-depth is a 4x4/s1 conv with
C_in=12, C_out=64 followed by the 3x3/s2/p1 maxpool.  C_out=64 fills
half the MXU's 128 output lanes — the measured 64-channel conv ceiling
(docs/ARCHITECTURE.md §7).  stem_conv_pool_fold2 folds output-row pairs
into channels: a (5,4)-kernel stride-(2,1) conv with C_out=128 (full
lanes, 80% useful-FLOP density) whose output feeds the maxpool directly
in folded form, so the half-lane [N,64,112,112] tensor never
materializes in HBM.

Measures, at batch 128 (x = [128, 12, 112, 112] int8):
  base_native : conv2d_int8 native + maxpool2d_int8 (today's route)
  base_bf16   : same with the exact-bf16 conv reformulation
  fold2_int8  : stem_conv_pool_fold2 (int8 conv)
  fold2_bf16  : stem_conv_pool_fold2 (exact-bf16 conv)
All bit-exactness-checked against base_native first.

Run on the tunneled TPU:  python tools/fold2_bench.py
Timing: chained-median protocol (runtime/perf.median_pair_time) with a
real data dependency between iterations, same basis as bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from resnet_accel_tpu.ops.conv import conv2d_int8, stem_conv_pool_fold2
    from resnet_accel_tpu.ops.pooling import maxpool2d_int8
    from resnet_accel_tpu.runtime.perf import median_pair_time

    N = int(os.environ.get("FOLD2_BATCH", "128"))
    CHAIN = int(os.environ.get("FOLD2_CHAIN", "16"))
    C, H, W, O, K = 12, 112, 112, 64, 4
    PAD = ((2, 1), (2, 1))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (N, C, H, W), dtype=np.int8))
    w2d = jnp.asarray(rng.integers(-128, 128, (O, C * K * K),
                                   dtype=np.int8))
    bias = jnp.asarray(rng.integers(-2000, 2000, (O,), dtype=np.int32))
    fct = jnp.asarray((rng.random(O) * 5e-5 + 1e-5).astype(np.float32))

    def base(a, method):
        y = conv2d_int8(a, w2d, bias=bias, kernel=K, stride=1,
                        padding=PAD, factors=fct, relu=True,
                        method=method)
        return maxpool2d_int8(y, 3, 2, padding=1)

    variants = {
        "base_native": lambda a: base(a, "native"),
        "base_bf16": lambda a: base(a, "bf16"),
        "fold2_int8": lambda a: stem_conv_pool_fold2(
            a, w2d, bias, kernel=K, padding=PAD, factors=fct, relu=True),
        "fold2_bf16": lambda a: stem_conv_pool_fold2(
            a, w2d, bias, kernel=K, padding=PAD, factors=fct, relu=True,
            method="bf16"),
    }

    def time_fn(fn, chain=CHAIN):
        def chained(n):
            @jax.jit
            def loop(x0):
                def body(i, c):
                    y = fn(c)
                    return c ^ jnp.min(y)   # dep, shape-preserving carry
                return jax.lax.fori_loop(0, n, body, x0)[0, 0, 0, 0]
            _ = np.asarray(loop(x))
            return loop
        l1, lc = chained(1), chained(chain)
        return median_pair_time(l1, lc, x, chain, 9) * 1e6

    ref = np.asarray(jax.jit(variants["base_native"])(x))
    print(f"batch {N}  chain {CHAIN}  out {ref.shape}", flush=True)
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x))
        ok = np.array_equal(got, ref)
        t = time_fn(fn)
        print(f"  {name:12s} {t:8.1f} us/call   bit-exact={ok}",
              flush=True)
        if not ok:
            raise SystemExit(f"{name} not bit-exact")


if __name__ == "__main__":
    main()
