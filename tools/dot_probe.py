"""Diagnose int8 dot throughput for stem-complex row-GEMM shapes.

Measurement discipline (bench.py's): the repeat-chain lives INSIDE one
jitted fori_loop with a data dependency between iterations (eager ops
over the axon tunnel cost ~ms each and corrupt per-call timing), the
1-iteration program is subtracted, median over interleaved pairs.  The
kernel consumes the FULL accumulator via a lane-reduction so Mosaic
cannot narrow the dot to the stored slice.
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

CHAIN = 16


def chained(f, b):
    """Build l1/lc: n dependent calls of f(a, b) inside one jit."""
    def make(n):
        @jax.jit
        def loop(a):
            def body(i, a_c):
                out = f(a_c, b)
                return a_c + (out[0, 0, 0] & 0).astype(a_c.dtype)
            return jax.lax.fori_loop(0, n, body, a)[0, 0, 0]
        return loop
    return make(1), make(CHAIN)


def bench_one(M, K, N, steps, dtype=jnp.int8, acc_t=jnp.int32):
    """grid=(steps,): per-step ONE dot, B blocks DISTINCT per step,
    output = per-step lane-max of the full accumulator."""
    def kern(a_ref, b_ref, o_ref):
        acc = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)
        o_ref[0] = jnp.max(acc.reshape(M, N // 128, 128), axis=1)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-4, 4, (1, M, K)), dtype)
    b = jnp.asarray(rng.integers(-4, 4, (steps, K, N)), dtype)
    f = pl.pallas_call(
        kern, grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, M, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, M, 128), acc_t))
    l1, lc = chained(f, b)
    dt = median_pair_time(l1, lc, a, CHAIN, 7)
    macs = M * K * N * steps
    io = b.size + steps * M * 128 * 4
    print(f"{dtype.__name__} M={M:4d} K={K:4d} N={N:6d} x{steps}: "
          f"{dt*1e6:8.1f} us/call, {dt/steps*1e9:8.0f} ns/step, "
          f"{2*macs/dt/1e12:6.1f} TOPS, io={io/1e6:.0f}MB"
          f" ({io/dt/1e9:.0f} GB/s)")
    return dt


def control():
    """Known-rate controls: big bf16 and int8 matmuls."""
    n = 4096
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.normal(0, 1, (n, n)), jnp.bfloat16)
    l1, lc = chained(lambda a, b: a @ b, B)
    A = jnp.asarray(rng.normal(0, 1, (1, n, n)), jnp.bfloat16)

    def mk(nn):
        @jax.jit
        def loop(a):
            def body(i, a_c):
                out = a_c @ B
                return a_c + (out[0, 0] * 0).astype(a_c.dtype)
            return jax.lax.fori_loop(0, nn, body, a[0])[0, 0]
        return loop
    dt = median_pair_time(mk(1), mk(CHAIN), A, CHAIN, 7)
    print(f"control bf16 {n}^3: {dt*1e6:.1f} us, "
          f"{2*n**3/dt/1e12:.1f} TFLOP/s (peak ~197)")

    Ai = jnp.asarray(rng.integers(-4, 4, (1, n, n)), jnp.int8)
    Bi = jnp.asarray(rng.integers(-4, 4, (n, n)), jnp.int8)

    def mki(nn):
        @jax.jit
        def loop(a):
            def body(i, a_c):
                out = jax.lax.dot_general(
                    a_c, Bi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return a_c + (out[0, 0] & 0).astype(a_c.dtype)
            return jax.lax.fori_loop(0, nn, body, a[0])[0, 0]
        return loop
    dt = median_pair_time(mki(1), mki(CHAIN), Ai, CHAIN, 7)
    print(f"control int8 {n}^3: {dt*1e6:.1f} us, "
          f"{2*n**3/dt/1e12:.1f} TOPS (peak ~394)")


if __name__ == "__main__":
    print(jax.devices())
    control()
    bench_one(64, 192, 7168, 112)      # per-parity row dot
    bench_one(64, 192, 7168, 224)      # 2 parities as separate steps
    bench_one(64, 192, 14336, 112)     # both parities, one dot
    bench_one(64, 384, 7168, 112)      # two conv rows folded into K
    bench_one(128, 128, 7168, 112)
    bench_one(256, 256, 7168, 56)      # reference full-tile shape
