"""On-chip rates for the fused-stem kernel's building blocks.

Three measured quantities, each with the hazards of this tunnel worked
around (constant-foldable chain guards get the whole kernel DCE'd;
full-size per-step output blocks add ~4-13 us/step of block DMA;
streaming distinct HBM operands measures DMA, not the MXU):

1. MXU ns/dot for the candidate [M, K] @ [K, 57*128] shapes, operands
   VMEM-resident, slope between 1-dot and 3-dot kernels.
2. VPU rate for the epilogue op classes (int32 max chains = pooling,
   f32 requant chains), slope over chain length.
3. The chain dependency is REAL data flow: each call's [8, 128] output
   feeds the next call's additive input, so nothing folds or hoists.

Run: python tools/stem_dot_probe.py   (needs the TPU tunnel)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from resnet_accel_tpu.runtime.perf import median_pair_time  # noqa: E402

CHAIN = 16
STEPS = 112
NQ = 56          # lane-blocks per dot window
HALO = 2


def _time_kernel(kern, operands, out_like, scratch):
    """Chained timing of pallas_call(carry, *operands) -> carry', where
    carry is a small [8, 128] int32 block threaded through every call."""
    f = pl.pallas_call(
        kern, grid=(STEPS,),
        in_specs=[pl.BlockSpec(
            (8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(op.shape, lambda i: tuple(0 for _ in op.shape),
                         memory_space=pltpu.VMEM) for op in operands],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=scratch)
    carry0 = jnp.zeros((8, 128), jnp.int32)

    def mk(nn):
        @jax.jit
        def loop(c0):
            def body(i, c):
                return f(c, *operands)
            return jax.lax.fori_loop(0, nn, body, c0)[0, 0]
        return loop
    return median_pair_time(mk(1), mk(CHAIN), carry0, CHAIN, 7)


def dot_kernel(M, K, ndots):
    N = NQ * 128

    def kern(c_ref, a_ref, b_ref, o_ref, acc_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc = acc_ref[:]
        for d in range(ndots):
            off = ((g + d) % (HALO + 1)) * 128
            acc += jax.lax.dot_general(
                a_ref[:], b_ref[:, pl.ds(off, N)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        acc_ref[:] = acc
        o_ref[:] = acc[0:8, 0:128] + c_ref[0, 0]

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-4, 4, (M, K)), jnp.int8)
    b = jnp.asarray(rng.integers(-4, 4, (K, (NQ + HALO) * 128)), jnp.int8)
    return kern, (a, b), [pltpu.VMEM((M, N), jnp.int32)]


def probe_dot(M, K):
    k1, ops, scr = dot_kernel(M, K, 1)
    t1 = _time_kernel(k1, ops, None, scr)
    k3, ops, scr = dot_kernel(M, K, 3)
    t3 = _time_kernel(k3, ops, None, scr)
    per = (t3 - t1) / (2 * STEPS)
    macs = M * K * NQ * 128
    print(f"dot [{M:4d},{K:4d}]@[{K:4d},{NQ*128}]: {per*1e9:7.0f} ns "
          f"({2*macs/max(per,1e-12)/1e12:6.1f} useful TOPS); "
          f"1-dot step {t1/STEPS*1e6:5.2f} us")


def vpu_kernel(dtype, nops, shape=(64, NQ * 128)):
    """Chain of `nops` dependent elementwise ops on a resident plane."""
    def kern(c_ref, x_ref, o_ref):
        v = x_ref[:]
        if dtype == jnp.int32:
            for i in range(nops):
                v = jnp.maximum(v, v + np.int32(i + 1))   # pool-like
            o_ref[:] = v[0:8, 0:128] + c_ref[0, 0]
        else:
            f = v.astype(jnp.float32)
            for i in range(nops):
                f = f * np.float32(1.0001) + np.float32(i)  # requant-like
            o_ref[:] = jnp.rint(f[0:8, 0:128]).astype(jnp.int32) \
                + c_ref[0, 0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-99, 99, shape), jnp.int32)
    return kern, (x,)


def probe_vpu(dtype, name, n1=2, n2=10):
    k1, ops = vpu_kernel(dtype, n1)
    t1 = _time_kernel(k1, ops, None, [])
    k2, ops = vpu_kernel(dtype, n2)
    t2 = _time_kernel(k2, ops, None, [])
    per = (t2 - t1) / ((n2 - n1) * STEPS)
    n_el = 64 * NQ * 128
    print(f"vpu {name} [64,{NQ*128}]: {per*1e9:7.0f} ns/op-pass "
          f"({n_el/max(per,1e-12)/1e12:5.2f} T elem-ops/s)")


if __name__ == "__main__":
    print(jax.devices())
    probe_dot(128, 120)    # row-pair fold, K=(5 s2d rows x 24ch)
    probe_dot(128, 128)    # c-padded 4x32 window, lo/hi M-fold
    probe_dot(128, 96)     # unpadded 4x24 window
    probe_dot(64, 192)     # plain per-parity row dot
    probe_vpu(jnp.int32, "int32 max-chain")
    probe_vpu(jnp.float32, "f32 mul-add-chain")
