"""On-chip bit-exactness check for the fused stem kernel.

Compares ops.stem_fused.stem_conv_pool_nm against the shipping
composition (quantize_s2d_nm -> conv2d_int8 4x4 -> maxpool2d_int8) on
the real TPU, element-exact, at a small geometry and the ImageNet one.
The hermetic algebra tests live in tests/test_stem_fused.py; this
validates the Mosaic lowering itself.

Run: python tools/stem_fused_check.py   (tunneled TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(H, W, N=128, seed=0, stacked=False):
    import jax.numpy as jnp
    from resnet_accel_tpu.ops.conv import conv2d_int8, stem_s2d_weights
    from resnet_accel_tpu.ops.epilogue import requant_factors
    from resnet_accel_tpu.ops.pooling import maxpool2d_int8
    from resnet_accel_tpu.ops.stem_fused import stem_conv_pool_nm
    from resnet_accel_tpu.ops.stem_pack import quantize_s2d_nm
    from resnet_accel_tpu.quant import (bias_to_int32,
                                        quantize_symmetric_per_channel)

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (N, 3, H, W)).astype(np.float32)
    w = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    wq, ws = quantize_symmetric_per_channel(w, axis=0)
    w2d = stem_s2d_weights(jnp.asarray(wq.reshape(64, -1)), 3, 7)
    scale = float(np.abs(x).max() / 127.0)
    b = bias_to_int32(rng.normal(0, 0.5, 64).astype(np.float32),
                      scale, ws)
    f = requant_factors(scale, ws, 0.05)
    # N=128 exercises the nm golden kernel; other batch widths use the
    # composition (the nm kernel only legalizes at exactly 128 lanes)
    s = quantize_s2d_nm(jnp.asarray(x), scale)
    a = conv2d_int8(s, w2d, bias=jnp.asarray(b), kernel=4, stride=1,
                    padding=((2, 1), (2, 1)), factors=jnp.asarray(f),
                    relu=True)
    want = np.asarray(maxpool2d_int8(a, 3, 2, padding=1))
    got = np.asarray(stem_conv_pool_nm(
        jnp.asarray(x), w2d, jnp.asarray(b), jnp.asarray(f), scale,
        stacked=stacked))
    match = float((got == want).mean())
    print(f"H={H} W={W} N={N} stacked={stacked}: match {match:.6f}",
          flush=True)
    if match < 1.0:
        bad = np.argwhere(got != want)
        print("first mismatches:", bad[:8].tolist())
    return match == 1.0


def time_ab(N=128, H=224, W=224, reps=30, seed=0):
    """Kernel-only A/B: median wall time of the M=64 vs the stacked
    M=128 formulation at the ImageNet geometry (chained on one input;
    dispatch included, identical for both)."""
    import subprocess
    import time

    # Tunnel probe in a throwaway subprocess (bench.py pattern): a dead
    # or mid-handoff tunnel blocks make_c_api_client forever inside a
    # GIL-holding C call — this run hung 30 min with zero output when
    # queued immediately after another TPU process exited (round 5).
    for attempt in range(5):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=300, capture_output=True, check=True)
            break
        except subprocess.TimeoutExpired:
            print(f"tunnel probe attempt {attempt} timed out; retrying",
                  flush=True)
    else:
        raise RuntimeError("TPU tunnel did not come up in 5 probes")

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
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, 3, H, W)).astype(np.float32))
    w = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    wq, ws = quantize_symmetric_per_channel(w, axis=0)
    w2d = stem_s2d_weights(jnp.asarray(wq.reshape(64, -1)), 3, 7)
    scale = 3.0 / 127.0
    b = jnp.asarray(bias_to_int32(
        rng.normal(0, 0.5, 64).astype(np.float32), scale, ws))
    f = jnp.asarray(requant_factors(scale, ws, 0.05))
    # Call the (already-jitted) kernel entry point DIRECTLY — the same
    # calling convention the exactness check uses.  Wrapping it in an
    # outer jit(lambda) that closes over the weights made compilation
    # hang >30 min on the tunnel (weights become embedded jaxpr
    # constants); as traced ARGUMENTS the identical program compiles
    # in minutes (observed, round 5).
    for stacked in (False, True):
        print(f"stacked={stacked}: compiling...", flush=True)
        jax.block_until_ready(
            stem_conv_pool_nm(x, w2d, b, f, scale, stacked=stacked))
        print(f"stacked={stacked}: warm, timing {reps} reps", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(
                stem_conv_pool_nm(x, w2d, b, f, scale,
                                  stacked=stacked))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e6
        print(f"stacked={stacked}: median {med:.1f} us "
              f"({N * 1e6 / med / 1e3:.1f}k img/s stem-complex only)",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "time":
        time_ab()
        sys.exit(0)
    ok = True
    for stk in (False, True):
        ok = ok and check(32, 32, stacked=stk)
        ok = ok and check(224, 224, stacked=stk)
        ok = ok and check(224, 224, N=256, seed=1, stacked=stk)
    print("ALL-EXACT" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)
