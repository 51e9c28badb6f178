"""Stress tests: extreme sizes and degenerate inputs (test_stress.cpp role).

The reference stresses its driver/golden stack with extreme matrix sizes
and degenerate inputs (hw/sim/cpp/tests/test_stress.cpp).  Same idea here,
driven through the public op/sparse APIs and checked bit-exact against the
goldens — no tolerance anywhere.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops import (
    matmul_int8,
    matmul_int8_xla,
    quantize_input,
    requant_factors,
)
from resnet_accel_tpu.ops.bsr_matmul import (
    bsr_matmul_wt,
    bsr_matmul_wt_xla,
    pack_gather_bsr,
    pack_kernel_bsr,
)
from resnet_accel_tpu.sparse import build_bsr_int8_direct


class TestDegenerateGeometry:
    @pytest.mark.parametrize("shape", [
        (1, 1, 1),        # scalar GEMM
        (1, 1024, 1),     # dot product
        (257, 1, 1),      # outer-product column
        (1, 1, 257),      # single-row broadcast
        (3, 5, 7),        # tiny primes
    ])
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_gemm_extreme_shapes(self, shape, use_pallas):
        m, k, n = shape
        rng = np.random.default_rng(hash(shape) % 2**32)
        a = rng.integers(-128, 128, (m, k)).astype(np.int8)
        b = rng.integers(-128, 128, (k, n)).astype(np.int8)
        out = matmul_int8(jnp.asarray(a), jnp.asarray(b),
                          use_pallas=use_pallas)
        np.testing.assert_array_equal(
            np.asarray(out), golden.matmul_int8(a, b))

    def test_saturating_inputs(self):
        # All-extreme int8 operands; K kept below the int32 overflow bound
        # (127*128*K < 2^31).  Requant factor 1.0 saturates every output.
        k = 4096
        a = np.full((2, k), 127, np.int8)
        b = np.full((k, 3), -128, np.int8)
        acc = matmul_int8(jnp.asarray(a), jnp.asarray(b), use_pallas=False)
        assert int(np.asarray(acc)[0, 0]) == 127 * -128 * k
        out = matmul_int8(jnp.asarray(a), jnp.asarray(b),
                          factors=np.float32(1.0), use_pallas=False)
        np.testing.assert_array_equal(np.asarray(out), -128)

    def test_quantize_input_extremes(self):
        x = jnp.asarray([1e30, -1e30, 0.0, 1e-30], jnp.float32)
        out = np.asarray(quantize_input(x, 0.05))
        np.testing.assert_array_equal(out, [127, -128, 0, 0])


class TestDegenerateSparsity:
    def test_all_zero_matrix(self):
        # nnz = 0: the schedule still emits per-row filler blocks; output
        # must be exactly zero through every path.
        W = np.zeros((64, 96), np.int8)
        bsr = build_bsr_int8_direct(W, 32, 32)
        assert bsr.nnz_blocks == 0
        rng = np.random.default_rng(0)
        a = rng.integers(-128, 128, (4, 96)).astype(np.int8)
        out = bsr_matmul_wt(jnp.asarray(a), pack_kernel_bsr(bsr))
        np.testing.assert_array_equal(np.asarray(out), 0)
        out2 = bsr_matmul_wt_xla(jnp.asarray(a), pack_gather_bsr(bsr))
        np.testing.assert_array_equal(np.asarray(out2), 0)

    def test_single_block_in_large_matrix(self):
        rng = np.random.default_rng(1)
        W = np.zeros((256, 512), np.int8)
        W[64:96, 128:160] = rng.integers(-128, 128, (32, 32))
        bsr = build_bsr_int8_direct(W, 32, 32)
        assert bsr.nnz_blocks == 1
        a = rng.integers(-128, 128, (8, 512)).astype(np.int8)
        exp = golden.matmul_int8(a, np.ascontiguousarray(W.T))
        out = bsr_matmul_wt(jnp.asarray(a), pack_kernel_bsr(bsr))
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_fully_dense_bsr_equals_dense_gemm(self):
        rng = np.random.default_rng(2)
        W = rng.integers(-128, 128, (96, 128)).astype(np.int8)
        W[W == 0] = 1  # no accidental zero blocks
        bsr = build_bsr_int8_direct(W, 32, 32)
        assert bsr.nnz_blocks == bsr.total_blocks
        a = rng.integers(-128, 128, (4, 128)).astype(np.int8)
        exp = golden.matmul_int8(a, np.ascontiguousarray(W.T))
        out = bsr_matmul_wt(jnp.asarray(a), pack_kernel_bsr(bsr))
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_block_larger_than_matrix(self):
        rng = np.random.default_rng(3)
        W = rng.integers(-128, 128, (20, 30)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 64, 64)  # one giant padded block
        assert bsr.num_block_rows == 1 and bsr.num_block_cols == 1
        a = rng.integers(-128, 128, (2, 30)).astype(np.int8)
        exp = golden.matmul_int8(a, np.ascontiguousarray(W.T))
        out = bsr_matmul_wt_xla(jnp.asarray(a), pack_gather_bsr(bsr))
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_sub_block_matrix_single_14x14(self):
        # Smaller than one hardware block in both dims (edge masking).
        rng = np.random.default_rng(4)
        W = rng.integers(-128, 128, (5, 9)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 14, 14)
        a = rng.integers(-128, 128, (1, 9)).astype(np.int8)
        exp = golden.bsr_matmul_int8_wt(
            a, bsr.data, bsr.row_ptr, bsr.col_idx, 14, 14, 5)
        out = bsr_matmul_wt_xla(jnp.asarray(a), pack_gather_bsr(bsr))
        np.testing.assert_array_equal(np.asarray(out), exp)


class TestFusedEpilogueStress:
    def test_requant_epilogue_with_extreme_factors(self):
        # Factors far beyond/below representable output: everything
        # saturates or collapses to zero, never wraps.
        rng = np.random.default_rng(5)
        a = rng.integers(-128, 128, (4, 64)).astype(np.int8)
        b = rng.integers(-128, 128, (64, 8)).astype(np.int8)
        big = matmul_int8(jnp.asarray(a), jnp.asarray(b),
                          factors=np.float32(1e9), use_pallas=False)
        acc = golden.matmul_int8(a, b)
        exp_sign = np.sign(acc)
        got = np.asarray(big).astype(np.int32)
        assert set(np.unique(got)).issubset({-128, 0, 127})
        np.testing.assert_array_equal(got[exp_sign > 0], 127)
        np.testing.assert_array_equal(got[exp_sign < 0], -128)
        tiny = matmul_int8(jnp.asarray(a), jnp.asarray(b),
                           factors=np.float32(1e-30), use_pallas=False)
        np.testing.assert_array_equal(np.asarray(tiny), 0)

    def test_bias_at_int32_extremes_saturates(self):
        a = np.zeros((2, 32), np.int8)
        b = np.zeros((32, 4), np.int8)
        bias = np.array([2**31 - 1, -(2**31), 0, 1], np.int32)
        out = matmul_int8(jnp.asarray(a), jnp.asarray(b),
                          bias=jnp.asarray(bias),
                          factors=np.float32(1.0), use_pallas=False)
        np.testing.assert_array_equal(np.asarray(out)[0], [127, -128, 0, 1])
