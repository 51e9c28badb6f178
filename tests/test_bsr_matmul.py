"""BSR sparse TPU kernels vs golden — bit-exact at every sparsity level."""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops.bsr_matmul import (
    pack_kernel_bsr,
    bsr_matmul_wt,
    pack_gather_bsr,
    bsr_matmul_wt_xla,
)
from resnet_accel_tpu.ops import requant_factors
from resnet_accel_tpu.sparse import build_bsr_int8_direct, load_layer_dir
from resnet_accel_tpu.sparse.regroup import regroup_bsr, effective_density

from conftest import requires_reference_data, REFERENCE_DATA


def sparse_weight(rng, n, k, bh, bw, sparsity):
    W = rng.integers(-128, 128, (n, k)).astype(np.int8)
    for br in range(-(-n // bh)):
        for bc in range(-(-k // bw)):
            if rng.random() < sparsity:
                W[br * bh:(br + 1) * bh, bc * bw:(bc + 1) * bw] = 0
    return W


class TestPallasKernel:
    @pytest.mark.parametrize("mode", ["resident", "stream"])
    @pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.9])
    def test_bit_exact_128_blocks(self, sparsity, mode):
        rng = np.random.default_rng(0)
        N, K, M = 256, 512, 64
        W = sparse_weight(rng, N, K, 128, 128, sparsity)
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 128)
        kb = pack_kernel_bsr(bsr)
        out = np.asarray(bsr_matmul_wt(jnp.asarray(A), kb, mode=mode))
        exp = golden.matmul_int8(A, W.T)
        np.testing.assert_array_equal(out, exp)

    def test_empty_rows_produce_zero_tiles(self):
        rng = np.random.default_rng(1)
        N, K, M = 384, 256, 32
        W = sparse_weight(rng, N, K, 128, 128, 0.0)
        W[128:256] = 0  # middle block row entirely zero
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        kb = pack_kernel_bsr(build_bsr_int8_direct(W, 128))
        out = np.asarray(bsr_matmul_wt(jnp.asarray(A), kb))
        np.testing.assert_array_equal(out, golden.matmul_int8(A, W.T))
        assert np.all(out[:, 128:256] == 0)

    def test_fused_bias_relu_requant(self):
        rng = np.random.default_rng(2)
        N, K, M = 128, 384, 48
        W = sparse_weight(rng, N, K, 128, 128, 0.3)
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        bias = rng.integers(-3000, 3000, N).astype(np.int32)
        ws = rng.uniform(0.001, 0.01, N).astype(np.float32)
        f = requant_factors(0.02, ws, 0.07)
        kb = pack_kernel_bsr(build_bsr_int8_direct(W, 128))
        out = np.asarray(bsr_matmul_wt(
            jnp.asarray(A), kb, bias=jnp.asarray(bias), factors=f,
            relu=True))
        acc = golden.matmul_int8(A, W.T).astype(np.int64) + bias[None, :]
        acc = np.maximum(acc, 0).astype(np.int32)
        exp = np.clip(np.rint(acc.astype(np.float32) * f[None, :]),
                      -128, 127).astype(np.int8)
        np.testing.assert_array_equal(out, exp)

    def test_unaligned_m_and_n(self):
        rng = np.random.default_rng(3)
        N, K, M = 200, 300, 17  # everything ragged
        W = sparse_weight(rng, N, K, 128, 128, 0.25)
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        kb = pack_kernel_bsr(build_bsr_int8_direct(W, 128))
        out = np.asarray(bsr_matmul_wt(jnp.asarray(A), kb))
        np.testing.assert_array_equal(out, golden.matmul_int8(A, W.T))

    def test_k_mismatch_raises(self):
        kb = pack_kernel_bsr(
            build_bsr_int8_direct(np.ones((128, 256), np.int8), 128))
        with pytest.raises(ValueError):
            bsr_matmul_wt(jnp.zeros((4, 999), jnp.int8), kb)


class TestGatherXLAPath:
    @pytest.mark.parametrize("bh,bw,sparsity", [
        (14, 14, 0.0), (14, 14, 0.7), (14, 14, 0.95),
        (8, 8, 0.9), (4, 4, 0.5),
    ])
    def test_bit_exact_small_blocks(self, bh, bw, sparsity):
        rng = np.random.default_rng(4)
        N, K, M = 10 * bh, 20 * bw, 8
        W = sparse_weight(rng, N, K, bh, bw, sparsity)
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        g = pack_gather_bsr(build_bsr_int8_direct(W, bh, bw))
        out = np.asarray(bsr_matmul_wt_xla(jnp.asarray(A), g))
        np.testing.assert_array_equal(out, golden.matmul_int8(A, W.T))

    def test_vs_golden_bsr_wt(self):
        rng = np.random.default_rng(5)
        W = sparse_weight(rng, 70, 126, 14, 14, 0.6)
        A = rng.integers(-128, 128, (5, 126)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 14)
        g = pack_gather_bsr(bsr)
        out = np.asarray(bsr_matmul_wt_xla(jnp.asarray(A), g))
        exp = golden.bsr_matmul_int8_wt(
            A, bsr.data, bsr.row_ptr, bsr.col_idx, 14, 14, N=70)
        np.testing.assert_array_equal(out, exp)


class TestRegroup:
    def test_regroup_exact(self):
        rng = np.random.default_rng(6)
        W = sparse_weight(rng, 140, 280, 14, 14, 0.8)
        small = build_bsr_int8_direct(W, 14)
        big = regroup_bsr(small, 128, 128)
        np.testing.assert_array_equal(big.to_dense(), W)
        A = rng.integers(-128, 128, (9, 280)).astype(np.int8)
        kb = pack_kernel_bsr(big)
        out = np.asarray(bsr_matmul_wt(jnp.asarray(A), kb))
        np.testing.assert_array_equal(out, golden.matmul_int8(A, W.T))

    def test_effective_density(self):
        rng = np.random.default_rng(7)
        # 128-structured sparsity survives a 128 regroup exactly.
        W = sparse_weight(rng, 512, 512, 128, 128, 0.75)
        bsr = build_bsr_int8_direct(W, 128)
        d = effective_density(bsr, 128, 128)
        assert abs(d - bsr.density) < 1e-9


@requires_reference_data
class TestReferenceFc1Sparse:
    def test_fc1_artifact_through_gather_path(self):
        bsr = load_layer_dir(f"{REFERENCE_DATA}/bsr_export_14x14/fc1")
        K = bsr.padded_shape[1]
        act = ((np.arange(K) % 256) - 128).astype(np.int8).reshape(1, K)
        g = pack_gather_bsr(bsr)
        out = np.asarray(bsr_matmul_wt_xla(jnp.asarray(act), g))
        exp = golden.bsr_matmul_int8_wt(
            act, bsr.data, bsr.row_ptr, bsr.col_idx, 14, 14)[:, :bsr.shape[0]]
        np.testing.assert_array_equal(out, exp)

    def test_fc1_artifact_through_pallas_after_regroup(self):
        bsr = load_layer_dir(f"{REFERENCE_DATA}/bsr_export_14x14/fc1")
        big = regroup_bsr(bsr, 128, 128)
        K = big.padded_shape[1]
        act = ((np.arange(K) % 256) - 128).astype(np.int8).reshape(1, K)
        kb = pack_kernel_bsr(big)
        out = np.asarray(bsr_matmul_wt(jnp.asarray(act), kb))
        exp = golden.matmul_int8(act, big.to_dense(padded=True)[:, :K].T
                                 .astype(np.int8))[:, :big.shape[0]]
        np.testing.assert_array_equal(out, exp)
