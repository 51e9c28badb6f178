"""On-chip bit-exactness + speed check for ops/expand_fused.py.

Element-exact comparison of the fused expansion kernel vs the shipping
composition (conv2d_int8 + add_residual) at the real ResNet-50 stage
geometries, plus xprof device time for both.

Run: python tools/expand_fused_check.py   (tunneled TPU, ~3 min)
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
    from resnet_accel_tpu.ops.conv import conv2d_int8
    from resnet_accel_tpu.ops.epilogue import add_residual
    from resnet_accel_tpu.ops.expand_fused import expand_add_int8
    from resnet_accel_tpu.runtime import xprof

    rng = np.random.default_rng(0)
    # (C_in, C_out, H=W) per -50 stage, batch 128
    geoms = [(64, 256, 56), (128, 512, 28), (256, 1024, 14),
             (512, 2048, 7)]
    print(f"{'geometry':>22} {'fused us':>9} {'xla us':>9} "
          f"{'speedup':>8} exact")
    for cin, cout, hw in geoms:
        x = jnp.asarray(rng.integers(-128, 128, (128, cin, hw, hw)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-128, 128, (cout, cin)), jnp.int8)
        b = jnp.asarray(rng.integers(-1000, 1000, (cout,)), jnp.int32)
        f = jnp.asarray(
            rng.uniform(0.0005, 0.004, (cout,)).astype(np.float32))
        r = jnp.asarray(rng.integers(-128, 128, (128, cout, hw, hw)),
                        jnp.int8)
        sm, sr, so = 0.031, 0.057, 0.049

        def fused(x, r):
            return expand_add_int8(x, w, b, f, r, sm, sr, so)

        def ref(x, r):
            y = conv2d_int8(x, w, bias=b, kernel=1, stride=1, padding=0,
                            factors=np.asarray(f), relu=False)
            return add_residual(y, r, sm, sr, so, relu=True)

        got = np.asarray(jax.jit(fused)(x, r))
        exp = np.asarray(jax.jit(ref)(x, r))
        exact = bool(np.array_equal(got, exp))
        agg_f, _ = xprof.profile_layers(fused, x, r)
        agg_r, _ = xprof.profile_layers(ref, x, r)
        tf = sum(agg_f.values()) * 1e6
        tr = sum(agg_r.values()) * 1e6
        print(f"[128,{cin:4d}->{cout:4d},{hw:2d}x{hw:<2d}] {tf:9.1f} "
              f"{tr:9.1f} {tr / tf:7.2f}x {exact}")
        assert exact, f"MISMATCH at {cin}->{cout} {hw}x{hw}"
    print("all geometries element-exact on chip")


if __name__ == "__main__":
    main()
