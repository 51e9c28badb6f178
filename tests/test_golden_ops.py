"""Golden elementwise/pooling/requant tests, incl. banker's-rounding cases."""

import numpy as np

from resnet_accel_tpu.golden import (
    relu_int8,
    relu_int32,
    relu6_int8,
    requantize_int32_to_int8,
    add_residual_int8,
    maxpool2d_int8,
    avgpool_global_int8,
    conv2d_int8_simple,
    conv2d_int8_im2col,
    im2col_int8,
)
from resnet_accel_tpu.golden.ops import (
    q16_to_scale,
    requantize_per_channel,
    requantize_q16,
    scale_to_q16,
)


class TestRelu:
    def test_relu_int8(self):
        x = np.array([-128, -1, 0, 1, 127], dtype=np.int8)
        np.testing.assert_array_equal(relu_int8(x), [0, 0, 0, 1, 127])

    def test_relu_int32(self):
        x = np.array([-(2**31), -5, 0, 7, 2**31 - 1], dtype=np.int32)
        np.testing.assert_array_equal(relu_int32(x), [0, 0, 0, 7, 2**31 - 1])

    def test_relu6(self):
        # scale = 0.05 -> max_val = int(6.0/0.05) = 120
        x = np.array([-5, 0, 100, 121, 127], dtype=np.int8)
        np.testing.assert_array_equal(relu6_int8(x, 0.05), [0, 0, 100, 120, 120])


class TestRequantizeQ16:
    """Hardware-exact Q16.16 path (output_accumulator.sv:397-426)."""

    def test_scale_conversion_matches_driver(self):
        # accel.py:377: int(S * 65536) & 0xFFFFFFFF (truncation).
        assert scale_to_q16(0.5) == 0x8000
        assert scale_to_q16(1.0) == 0x10000
        assert scale_to_q16(1.5) == 0x18000
        assert scale_to_q16(0.0000076) == 0  # underflow truncates to 0

    def test_known_vectors(self):
        # scale 0.5 (0x8000): floor(acc/2)
        x = np.array([0, 1, 2, 3, -1, -2, -3, 255], dtype=np.int32)
        out = requantize_q16(x, 0x8000)
        np.testing.assert_array_equal(out, [0, 0, 1, 1, -1, -1, -2, 127])

    def test_floor_not_round(self):
        # Arithmetic shift floors toward -inf — distinct from the float
        # golden's round-half-even.
        x = np.array([-1, -65536, -65537], dtype=np.int32)
        out = requantize_q16(x, 0x0001)  # scale = 1/65536
        np.testing.assert_array_equal(out, [-1, -1, -2])

    def test_fraction_bits_only(self):
        # The RTL multiplies by scale[15:0] only: a Q16.16 value of 1.5
        # (0x18000) applies 0.5, and exactly 1.0 (0x10000) applies 0.
        x = np.array([100, -100], dtype=np.int32)
        np.testing.assert_array_equal(
            requantize_q16(x, 0x18000), requantize_q16(x, 0x8000))
        np.testing.assert_array_equal(requantize_q16(x, 0x10000), [0, 0])
        assert q16_to_scale(0x18000) == 0.5

    def test_relu_before_scale(self):
        x = np.array([-1000, 1000], dtype=np.int32)
        out = requantize_q16(x, 0xFFFF, relu=True)
        assert out[0] == 0
        assert out[1] == 127  # 1000 * 0.99998... -> 999 -> saturate

    def test_saturation_and_extremes(self):
        x = np.array([2**31 - 1, -(2**31)], dtype=np.int32)
        np.testing.assert_array_equal(
            requantize_q16(x, 0xFFFF), [127, -128])
        # scale 0 zeroes everything, even extremes.
        np.testing.assert_array_equal(requantize_q16(x, 0), [0, 0])

    def test_matches_bigint_oracle(self):
        rng = np.random.default_rng(7)
        x = rng.integers(-(2**31), 2**31, 2048).astype(np.int64)
        x = np.concatenate(
            [x, [2**31 - 1, -(2**31), 0, -1, 1, 65535, -65536]]
        ).astype(np.int32)
        for s in [0x0001, 0x1234, 0x8000, 0xFFFF, 0x2ABCD]:
            got = requantize_q16(x, s)
            exp = np.array(
                [max(-128, min(127, (int(v) * (s & 0xFFFF)) >> 16))
                 for v in x], dtype=np.int8)
            np.testing.assert_array_equal(got, exp)


class TestRequantize:
    def test_bankers_rounding(self):
        # scale_factor = 0.5: 1 -> 0.5 -> 0, 3 -> 1.5 -> 2, 5 -> 2.5 -> 2
        x = np.array([1, 3, 5, -1, -3, -5], dtype=np.int32)
        out = requantize_int32_to_int8(x, 1.0, 2.0)
        np.testing.assert_array_equal(out, [0, 2, 2, 0, -2, -2])

    def test_saturation_not_wrap(self):
        x = np.array([100000, -100000], dtype=np.int32)
        out = requantize_int32_to_int8(x, 1.0, 1.0)
        np.testing.assert_array_equal(out, [127, -128])

    def test_identity_scale(self):
        x = np.arange(-128, 128, dtype=np.int32)
        out = requantize_int32_to_int8(x, 1.0, 1.0)
        np.testing.assert_array_equal(out, x.astype(np.int8))

    def test_float32_semantics(self):
        # The scale factor is computed in float32 (matching the C++ float
        # division), not float64.
        x = np.array([3000], dtype=np.int32)
        in_s, out_s = 0.1, 0.3
        sf32 = np.float32(in_s) / np.float32(out_s)
        expected = np.clip(np.rint(np.float32(3000) * sf32), -128, 127)
        out = requantize_int32_to_int8(x, in_s, out_s)
        assert out[0] == expected.astype(np.int8)

    def test_per_channel(self):
        x = np.array([[100, 100], [200, 200]], dtype=np.int32)
        scales = np.array([0.01, 0.02], dtype=np.float32)
        out = requantize_per_channel(x, scales, out_scale=0.1, axis=-1)
        # col0: x*0.1 -> [10, 20]; col1: x*0.2 -> [20, 40]
        np.testing.assert_array_equal(out, [[10, 20], [20, 40]])


class TestResidualAdd:
    def test_same_scale(self):
        m = np.array([10, -10], dtype=np.int8)
        r = np.array([5, 5], dtype=np.int8)
        out = add_residual_int8(m, r, 0.1, 0.1, 0.1)
        np.testing.assert_array_equal(out, [15, -5])

    def test_differing_scales(self):
        m = np.array([100], dtype=np.int8)   # 100*0.03 = 3.0
        r = np.array([40], dtype=np.int8)    # 40*0.05  = 2.0
        out = add_residual_int8(m, r, 0.03, 0.05, 0.05)  # 5.0/0.05 = 100
        np.testing.assert_array_equal(out, [100])

    def test_saturates(self):
        m = np.array([127], dtype=np.int8)
        r = np.array([127], dtype=np.int8)
        out = add_residual_int8(m, r, 1.0, 1.0, 1.0)
        np.testing.assert_array_equal(out, [127])


class TestPooling:
    def test_maxpool_2x2(self):
        x = np.array([[[1, 3, 5, 2],
                       [2, 4, 1, 6],
                       [7, 8, 4, 9],
                       [3, 1, 2, 5]]], dtype=np.int8)
        out = maxpool2d_int8(x, 2, 2)
        np.testing.assert_array_equal(out, [[[4, 6], [8, 9]]])

    def test_maxpool_negative(self):
        x = np.full((1, 2, 2), -128, dtype=np.int8)
        x[0, 1, 1] = -5
        out = maxpool2d_int8(x, 2, 2)
        assert out[0, 0, 0] == -5

    def test_avgpool_rounding(self):
        # sum=100, HW=49: (100+24)//49 = 2
        x = np.zeros((1, 7, 7), dtype=np.int8)
        x.flat[:50] = 2
        s = int(x.sum())
        expected = (s + 24) // 49
        out = avgpool_global_int8(x)
        assert out[0] == expected

    def test_avgpool_negative_truncates_toward_zero(self):
        # C semantics: (-100 + 2) / 4 = -24 (trunc), not -25 (floor).
        x = np.full((1, 2, 2), -25, dtype=np.int8)
        out = avgpool_global_int8(x)
        s = -100 + 2  # sum + hw/2
        assert out[0] == int(s / 4)  # Python / + int() truncates


class TestConv:
    def test_direct_vs_im2col(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-128, 128, (3, 9, 9)).astype(np.int8)
        w = rng.integers(-128, 128, (8, 3, 3, 3)).astype(np.int8)
        b = rng.integers(-1000, 1000, (8,)).astype(np.int32)
        for stride, pad in [(1, 0), (1, 1), (2, 1), (2, 0)]:
            direct = conv2d_int8_simple(x, w, b, stride, pad)
            viagemm = conv2d_int8_im2col(
                x, w.reshape(8, -1), b, 3, 3, stride, pad)
            np.testing.assert_array_equal(direct, viagemm)

    def test_known_identity_kernel(self):
        x = np.arange(16, dtype=np.int8).reshape(1, 4, 4)
        w = np.zeros((1, 1, 3, 3), dtype=np.int8)
        w[0, 0, 1, 1] = 1  # identity
        out = conv2d_int8_simple(x, w, None, 1, 1)
        np.testing.assert_array_equal(out[0], x[0].astype(np.int32))

    def test_im2col_shape_and_padding(self):
        x = np.ones((2, 5, 5), dtype=np.int8)
        cols = im2col_int8(x, 3, 1, 1)
        assert cols.shape == (2 * 9, 25)
        # Corner output position has 4 padded zeros per channel.
        corner = cols[:9, 0]
        assert (corner == 0).sum() == 5  # kh/kw in {0} row+col padded
