"""Property-based hardening of the golden numerical contract (hypothesis).

Randomized invariants over the bit-exactness layer: packing round-trips,
dense/sparse equivalence, requantization bounds and tie behavior,
serialization inverses — for arbitrary shapes, block sizes, sparsities.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from resnet_accel_tpu import golden
from resnet_accel_tpu.sparse import (
    build_bsr_int8_direct,
    deserialize_hw_stream,
    serialize_hw_stream,
)

dims = st.integers(min_value=1, max_value=60)
blocks = st.sampled_from([2, 4, 8, 14, 16])
seeds = st.integers(min_value=0, max_value=2**31 - 1)


def rand_i8(seed, shape, zero_frac=0.0):
    rng = np.random.default_rng(seed)
    x = rng.integers(-128, 128, shape).astype(np.int8)
    if zero_frac:
        mask = rng.random(shape) < zero_frac
        x[mask] = 0
    return x


class TestBSRProperties:
    @settings(max_examples=40, deadline=None)
    @given(h=dims, w=dims, bh=blocks, bw=blocks, seed=seeds)
    def test_pack_roundtrip(self, h, w, bh, bw, seed):
        W = rand_i8(seed, (h, w), zero_frac=0.5)
        bsr = build_bsr_int8_direct(W, bh, bw)
        bsr.validate()
        np.testing.assert_array_equal(bsr.to_dense(), W)

    @settings(max_examples=30, deadline=None)
    @given(m=st.integers(1, 8), h=dims, w=dims, b=blocks, seed=seeds)
    def test_sparse_equals_dense_gemm(self, m, h, w, b, seed):
        W = rand_i8(seed, (h, w), zero_frac=0.6)
        A = rand_i8(seed + 1, (m, w))
        bsr = build_bsr_int8_direct(W, b)
        got = golden.bsr_matmul_int8_wt(
            A, bsr.data, bsr.row_ptr, bsr.col_idx, b, b, N=h)
        np.testing.assert_array_equal(got, golden.matmul_int8(A, W.T))

    @settings(max_examples=30, deadline=None)
    @given(h=dims, w=dims, b=blocks, seed=seeds)
    def test_hw_stream_is_inverse(self, h, w, b, seed):
        W = rand_i8(seed, (h, w), zero_frac=0.4)
        bsr = build_bsr_int8_direct(W, b)
        back = deserialize_hw_stream(serialize_hw_stream(bsr), b, b,
                                     shape=bsr.shape)
        np.testing.assert_array_equal(back.to_dense(), W)


class TestRequantProperties:
    @settings(max_examples=50, deadline=None)
    @given(seed=seeds,
           in_scale=st.floats(1e-4, 1.0),
           out_scale=st.floats(1e-4, 1.0))
    def test_bounds_and_monotonicity(self, seed, in_scale, out_scale):
        x = np.sort(np.random.default_rng(seed).integers(
            -(2**24), 2**24, 64).astype(np.int32))
        out = golden.requantize_int32_to_int8(x, in_scale, out_scale)
        assert out.dtype == np.int8
        # saturating map of a monotone input stays monotone
        assert np.all(np.diff(out.astype(np.int32)) >= 0)

    @settings(max_examples=50, deadline=None)
    @given(v=st.integers(-(2**20), 2**20))
    def test_matches_scalar_float32_semantics(self, v):
        # One element vs an explicit float32 scalar evaluation.
        out = golden.requantize_int32_to_int8(
            np.array([v], np.int32), 0.013, 0.07)
        sf = np.float32(0.013) / np.float32(0.07)
        exp = float(np.rint(np.float32(v) * sf))
        exp = max(-128, min(127, int(exp)))
        assert int(out[0]) == exp

    @settings(max_examples=30, deadline=None)
    @given(seed=seeds, s=st.floats(1e-3, 0.5))
    def test_residual_same_scale_is_saturating_add(self, seed, s):
        rng = np.random.default_rng(seed)
        a = rng.integers(-128, 128, 128).astype(np.int8)
        b = rng.integers(-128, 128, 128).astype(np.int8)
        out = golden.add_residual_int8(a, b, s, s, s)
        exp = np.clip(a.astype(np.int32) + b.astype(np.int32), -128, 127)
        np.testing.assert_array_equal(out.astype(np.int32), exp)


class TestPoolingProperties:
    @settings(max_examples=30, deadline=None)
    @given(c=st.integers(1, 4), h=st.integers(2, 12), seed=seeds)
    def test_maxpool_output_subset_of_input(self, c, h, seed):
        x = rand_i8(seed, (c, h, h))
        out = golden.maxpool2d_int8(x, 2, 2)
        for ch in range(c):
            assert set(out[ch].reshape(-1)) <= set(x[ch].reshape(-1))

    @settings(max_examples=30, deadline=None)
    @given(c=st.integers(1, 4), h=st.integers(1, 10), seed=seeds)
    def test_avgpool_within_range(self, c, h, seed):
        x = rand_i8(seed, (c, h, h))
        out = golden.avgpool_global_int8(x)
        for ch in range(c):
            lo, hi = int(x[ch].min()), int(x[ch].max())
            assert lo - 1 <= int(out[ch]) <= hi + 1


class TestConvProperties:
    @settings(max_examples=15, deadline=None)
    @given(ci=st.integers(1, 4), co=st.integers(1, 6),
           h=st.integers(3, 10), stride=st.integers(1, 2),
           pad=st.integers(0, 1), seed=seeds)
    def test_direct_equals_im2col(self, ci, co, h, stride, pad, seed):
        x = rand_i8(seed, (ci, h, h))
        w = rand_i8(seed + 1, (co, ci, 3, 3))
        a = golden.conv2d_int8_simple(x, w, None, stride, pad)
        b = golden.conv2d_int8_im2col(x, w.reshape(co, -1), None, ci, 3,
                                      stride, pad)
        np.testing.assert_array_equal(a, b)
