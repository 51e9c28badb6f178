"""Mosaic lowering capability probe for the fused stem-complex kernel.

Round-4 design question set: the conv+pool kernel wants (a) value
reshapes that merge/split the minor (sublane, lane) dims, (b) 3D
free-dim dots, (c) sublane-offset slices on 5D refs, (d) int8->int32
bitcasts that pack 4 adjacent sublanes, (e) clamped out-of-range
index_map blocks.  Each probe is one tiny pallas_call; PASS/FAIL tells
us which formulation of the kernel is expressible on this jax/libtpu.

Run: python tools/mosaic_probe.py            (needs the TPU tunnel)
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                fn()
                print(f"PASS  {name}  ({time.time()-t0:.1f}s)")
                return True
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL  {name}: {type(e).__name__}: {msg}")
                return False
        run.__name__ = name
        return run
    return deco


@probe("merge_reshape_i8_value [12,56,128]->[12,7168]")
def p_merge_i8():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(12, 56 * 128)
    x = jnp.arange(12 * 56 * 128, dtype=jnp.int32).astype(jnp.int8)
    x = x.reshape(12, 56, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((12, 7168), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                  np.asarray(x).reshape(-1))


@probe("split_reshape_i32_value [64,7168]->[64,56,128]")
def p_split_i32():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(64, 56, 128)
    x = jnp.arange(64 * 7168, dtype=jnp.int32).reshape(64, 7168)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 56, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1),
                                  np.asarray(x).reshape(-1))


@probe("einsum_3d_free dot ok,kqn->oqn int8->int32")
def p_einsum3d():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    a = jnp.ones((64, 192), jnp.int8)
    b = jnp.ones((192, 56, 128), jnp.int8)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 56, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
    np.testing.assert_array_equal(np.asarray(out), 192)


@probe("dot2d [64,192]@[192,7168] int8 in-kernel")
def p_dot2d():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    a = jnp.ones((64, 192), jnp.int8)
    b = jnp.ones((192, 7168), jnp.int8)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 7168), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
    np.testing.assert_array_equal(np.asarray(out), 192)


@probe("slice_5d_ref read [1,12,2,58,128] -> [12,56,128]")
def p_slice5d():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[0, :, 1, 1:57, :]
    x = jnp.arange(12 * 2 * 58 * 128, dtype=jnp.int32).astype(
        jnp.int8).reshape(1, 12, 2, 58, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((12, 56, 128), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x)[0, :, 1, 1:57, :])


@probe("bitcast_pack4 [8,224,128]i8 -> [8,56,128]i32")
def p_bitcast4():
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (8, 224, 128), dtype=np.int8))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 56, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    # byte b of out[h, q, n] should be x[h, 4q+b, n]
    o = np.asarray(out)
    x_np = np.asarray(x)
    for b in range(4):
        got = ((o >> (8 * b)) & 0xFF).astype(np.uint8).astype(np.int8)
        np.testing.assert_array_equal(got, x_np[:, b::4, :],
                                      err_msg=f"byte {b}")


@probe("store_loop 56 lane-slices [64,128] into [1,56,64,128]")
def p_store_loop():
    def k(x_ref, o_ref):
        for q in range(56):
            o_ref[0, q, :, :] = x_ref[:, q * 128:(q + 1) * 128]
    x = jnp.arange(64 * 7168, dtype=jnp.int32).reshape(64, 7168)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 56, 64, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    o = np.asarray(out)[0]
    x_np = np.asarray(x).reshape(64, 56, 128)
    np.testing.assert_array_equal(o, x_np.transpose(1, 0, 2))


@probe("oob_index_map clamps (grid 4, map i-1)")
def p_oob():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:]
    x = jnp.arange(4 * 8 * 128, dtype=jnp.int32).reshape(4, 8, 128)
    out = pl.pallas_call(
        k, grid=(4,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i - 1, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.int32))(x)
    o = np.asarray(out)
    x_np = np.asarray(x)
    # if clamped, block 0 reads row 0 (i-1 = -1 -> 0)
    np.testing.assert_array_equal(o[0], x_np[0])
    np.testing.assert_array_equal(o[1:], x_np[:3])
    print("      -> OOB index_map CLAMPS to valid range")


@probe("scratch_carry persists across grid steps")
def p_carry():
    def k(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += x_ref[0]
        o_ref[0] = acc_ref[:]
    x = jnp.ones((4, 8, 128), jnp.int32)
    out = pl.pallas_call(
        k, grid=(4,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)])(x)
    np.testing.assert_array_equal(np.asarray(out)[3], 4)


@probe("roll_lanes pltpu.roll by 128 on [64,7168]")
def p_roll():
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 128, 1)
    x = jnp.arange(64 * 7168, dtype=jnp.int32).reshape(64, 7168)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 7168), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.roll(np.asarray(x), 128, 1))


def bench_dot_shapes():
    """Raw MXU rate for the candidate row-GEMM shapes."""
    shapes = [
        (64, 192, 7168),    # per-parity row dot
        (64, 192, 14336),   # both parities lane-concat
        (64, 48, 7168),     # per-kh dot (no-copy ring view)
        (128, 192, 7168),   # two conv rows folded into M (2x weights)
        (64, 256, 7168),    # K padded to 256
    ]
    for (M, K, N) in shapes:
        def k(a_ref, b_ref, o_ref):
            acc = jnp.zeros((M, N), jnp.int32)
            for _ in range(8):  # amortize grid/IO: 8 dots per step
                acc += jax.lax.dot_general(
                    a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            o_ref[:] = acc
        a = jnp.ones((M, K), jnp.int8)
        b = jnp.ones((K, N), jnp.int8)
        try:
            f = pl.pallas_call(
                k, grid=(14,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))
            jf = jax.jit(lambda a, b: f(a, b))
            jf(a, b).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(10):
                r = jf(a, b)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / 10
            ndots = 14 * 8
            macs = M * K * N * ndots
            print(f"dot M={M:4d} K={K:3d} N={N:6d}: {dt*1e6:8.1f} us "
                  f"/{ndots} dots = {dt/ndots*1e9:7.1f} ns/dot, "
                  f"{2*macs/dt/1e12:6.1f} TOPS")
        except Exception as e:
            print(f"dot M={M} K={K} N={N}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    print(f"jax {jax.__version__}, devices: {jax.devices()}")
    probes = [p_merge_i8, p_split_i32, p_einsum3d, p_dot2d, p_slice5d,
              p_bitcast4, p_store_loop, p_oob, p_carry, p_roll]
    results = {}
    for p in probes:
        results[p.__name__] = p()
    print("\n-- dot shape microbench --")
    bench_dot_shapes()
