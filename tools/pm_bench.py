"""On-chip benchmark for the pixel-major conv engine (ops/conv_pm.py).

Measures, at ResNet layer1 geometry (batch 128, C=64, 56x56):
  1. the XLA native-conv identity block chain (today's default path),
  2. the pair-plane v2 kernel chain incl. plane entry/exit,
  3. (optionally) the v1 single-row kernel and a chunk-size sweep,
and cross-checks v2 vs XLA elementwise (tolerating the documented
+-1 LSB FMA-tie class on the fused residual path).

Run on the tunneled TPU:  python tools/pm_bench.py [--sweep]
Timing is the chained-median protocol (runtime/perf.median_pair_time)
with a real data dependency (each iteration's output feeds the next
input), the same basis as bench.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep v2 chunk sizes and time v1")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--chain", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from resnet_accel_tpu.ops import conv_pm
    from resnet_accel_tpu.ops.conv import conv2d_int8
    from resnet_accel_tpu.ops.epilogue import add_residual
    from resnet_accel_tpu.runtime.perf import median_pair_time

    N, C, H, W = args.batch, 64, args.hw, args.hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (N, C, H, W), dtype=np.int8))

    def mk(seed):
        r = np.random.default_rng(seed)
        return (r.integers(-128, 128, (C, C * 9), dtype=np.int8),
                jnp.asarray(r.integers(-2000, 2000, (C,), dtype=np.int32)),
                jnp.asarray((r.random(C) * 5e-5 + 1e-5).astype(np.float32)))

    P = [mk(i) for i in range(4)]
    SC = [(0.041237, 0.031911, 0.051733), (0.051123, 0.049731, 0.061317)]

    def xla_layer1(a):
        for b in range(2):
            w1, b1, f1 = P[2 * b]
            w2, b2, f2 = P[2 * b + 1]
            y = conv2d_int8(a, jnp.asarray(w1), bias=b1, kernel=3,
                            stride=1, padding=1, factors=f1, relu=True,
                            method="native")
            y = conv2d_int8(y, jnp.asarray(w2), bias=b2, kernel=3,
                            stride=1, padding=1, factors=f2, relu=False,
                            method="native")
            a = add_residual(y, a, *SC[b], relu=True)
        return a

    G2 = [jnp.asarray(conv_pm.pack_g3_pair(P[i][0], C)) for i in range(4)]

    def pm2_layer1(a, chunk=2048):
        planes = conv_pm.to_pm_planes(a)
        for b in range(2):
            _, b1, f1 = P[2 * b]
            _, b2, f2 = P[2 * b + 1]
            ye = conv_pm.conv3x3_pm2(planes[0], planes[1], G2[2 * b],
                                     b1, f1, n=N, relu=True, chunk=chunk)
            planes = conv_pm.conv3x3_pm2(ye[0], ye[1], G2[2 * b + 1],
                                         b2, f2, n=N, relu=False,
                                         residual=planes,
                                         res_scales=SC[b], chunk=chunk)
        return conv_pm.from_pm_planes(planes[0], planes[1], N)

    ref = np.asarray(jax.jit(xla_layer1)(x))
    got = np.asarray(jax.jit(pm2_layer1)(x))
    d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    n_mis, mx = int((d != 0).sum()), int(d.max())
    print(f"v2 vs XLA: mismatches {n_mis}/{d.size} max|d| {mx} "
          f"({'OK: FMA-tie class' if mx <= 1 else 'FAIL'})", flush=True)
    assert mx <= 1, "pm v2 deviates beyond the documented tie class"

    def chained(fn, n):
        @jax.jit
        def loop(x0):
            return jax.lax.fori_loop(
                0, n, lambda i, c: fn(c), x0)[0, 0, 0, 0]
        _ = np.asarray(loop(x))
        return loop

    def time_of(fn):
        l1, lc = chained(fn, 1), chained(fn, args.chain)
        return median_pair_time(l1, lc, x, args.chain, 9) * 1e6

    print(f"xla layer1: {time_of(xla_layer1):9.1f} us/batch{N}", flush=True)
    print(f"pm2 layer1: {time_of(pm2_layer1):9.1f} us/batch{N}", flush=True)

    if args.sweep:
        for chunk in (1024, 3584, 7168):
            t = time_of(lambda a, c=chunk: pm2_layer1(a, chunk=c))
            print(f"pm2 chunk={chunk}: {t:9.1f} us", flush=True)
        G1 = [jnp.asarray(conv_pm.pack_g3(P[i][0], C)) for i in range(4)]

        def pm1_layer1(a):
            apm = conv_pm.to_pixel_major(a)
            for b in range(2):
                _, b1, f1 = P[2 * b]
                _, b2, f2 = P[2 * b + 1]
                y = conv_pm.conv3x3_pm(apm, G1[2 * b], b1, f1, n=N,
                                       relu=True)
                apm = conv_pm.conv3x3_pm(y, G1[2 * b + 1], b2, f2, n=N,
                                         relu=False, residual=apm,
                                         res_scales=SC[b])
            return conv_pm.from_pixel_major(apm, N)

        print(f"pm1 layer1: {time_of(pm1_layer1):9.1f} us", flush=True)


if __name__ == "__main__":
    main()
