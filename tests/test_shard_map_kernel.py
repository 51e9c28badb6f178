"""Pallas kernels under shard_map — per-chip zero-skip GEMM over a mesh.

Demonstrates the multi-chip serving composition: the batch is sharded
over 'dp', each shard runs the SAME Pallas BSR kernel on its chip
(weights replicated), results concatenate — no collectives needed for
data-parallel inference, and the kernel is unchanged.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops.bsr_matmul import pack_kernel_bsr, bsr_matmul_wt
from resnet_accel_tpu.parallel import make_mesh
from resnet_accel_tpu.sparse import build_bsr_int8_direct


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 virtual CPU devices")
    return make_mesh(dp=4, tp=1, devices=devs[:4])


def test_bsr_kernel_under_shard_map(mesh):
    rng = np.random.default_rng(0)
    N, K, M = 256, 384, 64  # M sharded 4 ways -> 16 rows/chip
    W = rng.integers(-128, 128, (N, K)).astype(np.int8)
    W[0:128, 128:256] = 0
    A = rng.integers(-128, 128, (M, K)).astype(np.int8)
    kb = pack_kernel_bsr(build_bsr_int8_direct(W, 128), chunk=4)

    def per_chip(a_shard):
        return bsr_matmul_wt(a_shard, kb, backend="cpu")

    fwd = shard_map(
        per_chip, mesh=mesh,
        in_specs=P("dp", None),
        out_specs=P("dp", None),
        check_vma=False)
    a_sharded = jax.device_put(
        jnp.asarray(A), NamedSharding(mesh, P("dp", None)))
    out = np.asarray(jax.jit(fwd)(a_sharded))
    np.testing.assert_array_equal(out, golden.matmul_int8(A, W.T))


def test_sharded_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    N, K, M = 128, 256, 32
    W = rng.integers(-128, 128, (N, K)).astype(np.int8)
    A = rng.integers(-128, 128, (M, K)).astype(np.int8)
    kb = pack_kernel_bsr(build_bsr_int8_direct(W, 128), chunk=4)

    single = np.asarray(bsr_matmul_wt(jnp.asarray(A), kb, backend="cpu"))

    fwd = shard_map(
        lambda a: bsr_matmul_wt(a, kb, backend="cpu"),
        mesh=mesh, in_specs=P("dp", None), out_specs=P("dp", None),
        check_vma=False)
    a_sharded = jax.device_put(
        jnp.asarray(A), NamedSharding(mesh, P("dp", None)))
    out = np.asarray(jax.jit(fwd)(a_sharded))
    np.testing.assert_array_equal(out, single)
