"""Quantization tests (parity with sw/tests/post_training_quant_tests.py)."""

import numpy as np

from resnet_accel_tpu.quant import (
    quantize_symmetric_per_tensor,
    quantize_symmetric_per_channel,
    quantize_asymmetric_per_channel,
    dequantize,
    compute_quantization_error,
    quantize_params_per_channel,
    bias_to_int32,
    ActivationCalibrator,
    calibrate,
)


class TestSymmetric:
    def test_scale_formula(self):
        x = np.array([-2.54, 0.0, 1.0], dtype=np.float32)
        q, scale = quantize_symmetric_per_tensor(x)
        assert abs(scale - 2.54 / 127.0) < 1e-9
        assert q[0] == -127

    def test_zero_tensor_guard(self):
        q, scale = quantize_symmetric_per_tensor(np.zeros(4, np.float32))
        assert scale == 1e-12 and np.all(q == 0)

    def test_error_under_5pct(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 64)).astype(np.float32)
        q, scale = quantize_symmetric_per_tensor(x)
        err = compute_quantization_error(x, q, scale)
        assert err["max_error"] <= scale * 0.5 + 1e-9
        assert err["mean_error"] / (np.abs(x).mean()) < 0.05

    def test_per_channel_independent_scales(self):
        x = np.stack([np.full(8, 0.1), np.full(8, 10.0)]).astype(np.float32)
        q, scales = quantize_symmetric_per_channel(x, axis=0)
        assert scales.shape == (2,)
        assert np.all(q == 127)  # each channel maxes its own range
        deq = dequantize(q, scales, axis=0)
        np.testing.assert_allclose(deq, x, rtol=1e-5)

    def test_per_channel_conv_weights(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(16, 8, 3, 3)).astype(np.float32)
        q, scales = quantize_symmetric_per_channel(w, axis=0)
        assert scales.shape == (16,)
        err = compute_quantization_error(w, q, scales)
        assert err["snr_db"] > 30


class TestAsymmetric:
    def test_uint8_range(self):
        x = np.array([[0.0, 1.0, 2.0, 3.0]], dtype=np.float32)
        q, scales, zps = quantize_asymmetric_per_channel(x, axis=0)
        assert q.dtype == np.uint8
        assert q.min() == 0 and q.max() == 255
        assert zps[0] == 0  # min is 0

    def test_negative_range(self):
        x = np.array([[-1.0, 1.0]], dtype=np.float32)
        q, scales, zps = quantize_asymmetric_per_channel(x, axis=0)
        deq = (q.astype(np.float32) - zps[0]) * scales[0]
        np.testing.assert_allclose(deq, x, atol=scales[0])


class TestModelQuant:
    def test_params_dict(self):
        rng = np.random.default_rng(2)
        params = {
            "fc1.weight": rng.normal(size=(128, 64)).astype(np.float32),
            "fc1.bias": rng.normal(size=(128,)).astype(np.float32),
        }
        q = quantize_params_per_channel(params)
        assert q["fc1.weight"]["data"].dtype == np.int8
        assert q["fc1.weight"]["scales"].shape == (128,)
        assert "scale" in q["fc1.bias"]
        assert q["fc1.weight"]["error"]["snr_db"] > 25

    def test_bias_to_int32(self):
        bias = np.array([1.0, -1.0], dtype=np.float32)
        act_scale = 0.5
        wgt_scales = np.array([0.1, 0.2], dtype=np.float32)
        b32 = bias_to_int32(bias, act_scale, wgt_scales)
        np.testing.assert_array_equal(b32, [20, -10])
        assert b32.dtype == np.int32


class TestCalibration:
    def test_ranges_fold_across_batches(self):
        calib = ActivationCalibrator()
        calib.observe({"t": np.array([-1.0, 2.0])})
        calib.observe({"t": np.array([-3.0, 1.0])})
        r = calib.ranges["t"]
        assert r.min == -3.0 and r.max == 2.0 and r.absmax == 3.0
        assert r.batches == 2
        assert abs(r.symmetric_scale - 3.0 / 127.0) < 1e-9

    def test_calibrate_max_batches(self):
        seen = []

        def fwd(x):
            seen.append(x)
            return {"a": x}

        calib = calibrate(fwd, (np.full(2, i) for i in range(100)),
                          max_batches=5)
        assert len(seen) == 5
        assert calib.ranges["a"].max == 4.0

    def test_percentile_clips_outliers(self):
        calib = ActivationCalibrator(percentile=99.0)
        x = np.ones(1000, np.float32)
        x[0] = 1000.0  # one outlier
        calib.observe({"t": x})
        r = calib.ranges["t"]
        assert r.absmax == 1000.0          # raw range still tracked
        assert r.clipped < 10.0            # clip ignores the outlier
        assert r.symmetric_scale < 10.0 / 127.0

    def test_percentile_none_is_absmax(self):
        calib = ActivationCalibrator()
        calib.observe({"t": np.array([-3.0, 1.0])})
        assert abs(calib.ranges["t"].symmetric_scale
                   - 3.0 / 127.0) < 1e-9

    def test_asymmetric_scale_zp(self):
        calib = ActivationCalibrator()
        calib.observe({"t": np.array([0.0, 5.1])})
        scale, zp = calib.ranges["t"].asymmetric_scale_zp
        assert abs(scale - 5.1 / 255.0) < 1e-9 and zp == 0
