"""Pixel-major 3x3 conv kernel (ops/conv_pm.py) vs the golden conv.

The kernel's contract is the reference conv + requantize (+ residual
add) composition — golden_models.cpp:684 (direct conv), :883 (im2col),
with the output_accumulator epilogue semantics.  Interpret mode on CPU;
bit-exactness tolerance is 0 (int32 adds are associative, so the
kh-split recombination is exact).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from resnet_accel_tpu.golden.conv import conv2d_int8_simple
from resnet_accel_tpu.ops import conv_pm
from resnet_accel_tpu.ops.epilogue import add_residual, requantize


def _golden_block(x, w, bias, factors, relu, res=None, res_scales=None):
    """Per-sample golden conv -> requant (-> residual add)."""
    out = []
    for i in range(x.shape[0]):
        acc = conv2d_int8_simple(x[i], w, bias, stride=1, padding=1)
        y = requantize(jnp.asarray(acc), factors, relu=relu, axis=0)
        if res is not None:
            y = add_residual(y, jnp.asarray(res[i]), *res_scales, relu=True)
        out.append(np.asarray(y))
    return np.stack(out)


def _rand_layer(rng, c):
    w = rng.integers(-128, 128, size=(c, c, 3, 3), dtype=np.int8)
    bias = rng.integers(-1000, 1000, size=(c,), dtype=np.int32)
    factors = (rng.random(c).astype(np.float32) * 0.01 + 1e-3)
    return w, bias, factors.astype(np.float32)


class TestConvPM:
    @pytest.mark.parametrize("c,h,w_sp", [(8, 6, 5), (16, 4, 3)])
    def test_bit_exact_plain(self, c, h, w_sp):
        rng = np.random.default_rng(c)
        n = 128
        x = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        w, bias, factors = _rand_layer(rng, c)

        ref = _golden_block(x, w, bias, factors, relu=True)
        g = conv_pm.pack_g3(w.reshape(c, c * 9), c)
        xpm = conv_pm.to_pixel_major(jnp.asarray(x))
        out = conv_pm.conv3x3_pm(
            xpm, jnp.asarray(g), jnp.asarray(bias), jnp.asarray(factors),
            n=n, relu=True, interpret=True)
        got = np.asarray(conv_pm.from_pixel_major(out, n))
        np.testing.assert_array_equal(got, ref)

    def test_bit_exact_residual(self):
        rng = np.random.default_rng(7)
        n, c, h, w_sp = 128, 8, 5, 4
        x = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        res = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        w, bias, factors = _rand_layer(rng, c)
        scales = (0.03, 0.02, 0.05)

        ref = _golden_block(x, w, bias, factors, relu=False,
                            res=res, res_scales=scales)
        g = conv_pm.pack_g3(w.reshape(c, c * 9), c)
        xpm = conv_pm.to_pixel_major(jnp.asarray(x))
        rpm = conv_pm.to_pixel_major(jnp.asarray(res))
        out = conv_pm.conv3x3_pm(
            xpm, jnp.asarray(g), jnp.asarray(bias), jnp.asarray(factors),
            n=n, relu=False, residual=rpm, res_scales=scales,
            interpret=True)
        got = np.asarray(conv_pm.from_pixel_major(out, n))
        np.testing.assert_array_equal(got, ref)

    def test_chunked_matches_unchunked(self):
        rng = np.random.default_rng(3)
        n, c, h, w_sp = 128, 8, 4, 4
        x = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        w, bias, factors = _rand_layer(rng, c)
        g = conv_pm.pack_g3(w.reshape(c, c * 9), c)
        xpm = conv_pm.to_pixel_major(jnp.asarray(x))
        outs = [
            conv_pm.conv3x3_pm(
                xpm, jnp.asarray(g), jnp.asarray(bias),
                jnp.asarray(factors), n=n, relu=True, chunk=chunk,
                interpret=True)
            for chunk in (128, 256, w_sp * n)
        ]
        for o in outs[1:]:
            np.testing.assert_array_equal(np.asarray(outs[0]),
                                          np.asarray(o))

    def test_layout_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.integers(-128, 128, size=(128, 8, 5, 4), dtype=np.int8)
        pm = conv_pm.to_pixel_major(jnp.asarray(x))
        assert pm.shape == (5, 8, 4 * 128)
        back = np.asarray(conv_pm.from_pixel_major(pm, 128))
        np.testing.assert_array_equal(back, x)

    def test_pair_plane_bit_exact_plain(self):
        rng = np.random.default_rng(11)
        n, c, h, w_sp = 128, 8, 6, 5
        x = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        w, bias, factors = _rand_layer(rng, c)

        ref = _golden_block(x, w, bias, factors, relu=True)
        g = conv_pm.pack_g3_pair(w.reshape(c, c * 9), c)
        xe, xo = conv_pm.to_pm_planes(jnp.asarray(x))
        oe, oo = conv_pm.conv3x3_pm2(
            xe, xo, jnp.asarray(g), jnp.asarray(bias),
            jnp.asarray(factors), n=n, relu=True, interpret=True)
        got = np.asarray(conv_pm.from_pm_planes(oe, oo, n))
        np.testing.assert_array_equal(got, ref)

    def test_pair_plane_bit_exact_residual(self):
        # Scales are irregular mantissas, like real calibrated scales.
        # Round-ratio scales (e.g. s_res/s_out == 1/2) manufacture huge
        # populations of exact rounding ties, where XLA's documented
        # cross-compilation liberties (x/const -> x*(1/const), mul+add
        # -> fma; docs/ARCHITECTURE.md "FMA ties") flip the last LSB.
        # Real calibration never produces such ratios (measure-zero in
        # float32), so the bit-exact contract is stated off-tie — the
        # same convention the model-level golden tests rely on.
        rng = np.random.default_rng(13)
        n, c, h, w_sp = 128, 8, 4, 3
        x = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        res = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        w, bias, factors = _rand_layer(rng, c)
        scales = (0.043719, 0.029153, 0.061347)

        ref = _golden_block(x, w, bias, factors, relu=False,
                            res=res, res_scales=scales)
        g = conv_pm.pack_g3_pair(w.reshape(c, c * 9), c)
        xe, xo = conv_pm.to_pm_planes(jnp.asarray(x))
        re_, ro_ = conv_pm.to_pm_planes(jnp.asarray(res))
        oe, oo = conv_pm.conv3x3_pm2(
            xe, xo, jnp.asarray(g), jnp.asarray(bias),
            jnp.asarray(factors), n=n, relu=False,
            residual=(re_, ro_), res_scales=scales, interpret=True)
        got = np.asarray(conv_pm.from_pm_planes(oe, oo, n))
        np.testing.assert_array_equal(got, ref)

    def test_pair_plane_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-128, 128, size=(128, 8, 6, 4), dtype=np.int8)
        xe, xo = conv_pm.to_pm_planes(jnp.asarray(x))
        assert xe.shape == xo.shape == (3, 8, 4 * 128)
        back = np.asarray(conv_pm.from_pm_planes(xe, xo, 128))
        np.testing.assert_array_equal(back, x)

    def test_pack_g3_pair_jnp_matches_numpy(self):
        rng = np.random.default_rng(5)
        c = 16
        w2d = rng.integers(-128, 128, size=(c, c * 9), dtype=np.int8)
        a = conv_pm.pack_g3_pair(w2d, c)
        b = np.asarray(conv_pm.pack_g3_pair_jnp(w2d, c))
        np.testing.assert_array_equal(a, b)

    def test_rejects_bad_batch(self):
        x = jnp.zeros((4, 8, 4 * 96), jnp.int8)
        g = jnp.zeros((2, 3, 16, 16), jnp.int8)
        with pytest.raises(ValueError, match="multiple of 128"):
            conv_pm.conv3x3_pm(x, g, jnp.zeros(8, jnp.int32),
                               jnp.ones(8, jnp.float32), n=96,
                               interpret=True)


class TestPMTrunk:
    """The pm_trunk route of make_forward: identity 64-channel basic
    blocks run as chained pair-plane kernels (models/resnet18.py).
    Scales come from real calibration (irregular mantissas), so the
    bit-exact contract holds — see the residual-test comment above."""

    # Reduced stage plan + 16x16 input: same routing coverage (plane
    # entry, 2-block chain in plane layout, exit at the stride-2 stage
    # transition) at ~1/4 the interpret cost of the full ResNet-18.
    STAGES = [(64, 2, 1), (128, 1, 2)]

    def _model(self, seed):
        from resnet_accel_tpu.models.resnet18 import (
            init_resnet18_fp32, quantize_resnet18)
        rng = np.random.default_rng(seed)
        fp32 = init_resnet18_fp32(seed=seed, num_classes=10,
                                  small_input=True, stages=self.STAGES)
        calib = rng.normal(0, 1, (2, 3, 16, 16)).astype(np.float32)
        return rng, quantize_resnet18(fp32, calib, 10, small_input=True,
                                      stages=self.STAGES)

    def test_forward_matches_standard_path(self):
        from resnet_accel_tpu.models.resnet18 import make_forward
        rng, model = self._model(0)
        params = model.as_device_params()
        x = jnp.asarray(
            rng.normal(0, 1, (128, 3, 16, 16)).astype(np.float32))
        ref = np.asarray(
            make_forward(model, use_pallas=True)(params, x))
        got = np.asarray(
            make_forward(model, use_pallas=True, pm_trunk=True)(
                params, x))
        np.testing.assert_array_equal(got, ref)

    def test_small_batch_falls_back(self):
        # n % 128 != 0 -> the pm route must silently fall back to the
        # standard path (same results, no error).
        from resnet_accel_tpu.models.resnet18 import make_forward
        rng, model = self._model(1)
        params = model.as_device_params()
        x = jnp.asarray(
            rng.normal(0, 1, (4, 3, 16, 16)).astype(np.float32))
        ref = np.asarray(
            make_forward(model, use_pallas=True)(params, x))
        got = np.asarray(
            make_forward(model, use_pallas=True, pm_trunk=True)(
                params, x))
        np.testing.assert_array_equal(got, ref)

    def test_wh_trunk_combination(self):
        # The WH stem pipeline runs the trunk spatially TRANSPOSED with
        # tap-transposed convs; the pm route must transpose its pair
        # weights the same way (run_block_pm's g_of).
        from resnet_accel_tpu.models.resnet18 import make_forward
        rng, model = self._model(2)
        params = model.as_device_params()
        x = jnp.asarray(
            rng.normal(0, 1, (128, 3, 16, 16)).astype(np.float32))
        ref = np.asarray(
            make_forward(model, use_pallas=True, stem_wh=True)(params, x))
        got = np.asarray(
            make_forward(model, use_pallas=True, stem_wh=True,
                         pm_trunk=True)(params, x))
        np.testing.assert_array_equal(got, ref)


class TestConvPMProperties:
    """Hypothesis sweep of the pair-plane kernel over edge geometries:
    tiny spatial dims (H=2 boundary pads dominate), narrow W, channel
    counts off the 64 sweet spot, both epilogues."""

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        c=st.sampled_from([8, 16, 24]),
        h2=st.integers(min_value=1, max_value=4),
        w_sp=st.integers(min_value=1, max_value=5),
        relu=st.booleans(),
        with_res=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_pair_plane_matches_golden(self, c, h2, w_sp, relu,
                                       with_res, seed):
        rng = np.random.default_rng(seed)
        n, h = 128, 2 * h2
        x = rng.integers(-128, 128, size=(n, c, h, w_sp), dtype=np.int8)
        w, bias, factors = _rand_layer(rng, c)
        res = scales = None
        if with_res:
            res = rng.integers(-128, 128, size=(n, c, h, w_sp),
                               dtype=np.int8)
            # irregular mantissas: stay off the documented tie class
            scales = tuple(float(s) for s in
                           rng.uniform(0.02, 0.08, 3).astype(np.float32))
            relu = False

        ref = _golden_block(x, w, bias, factors, relu=relu,
                            res=res, res_scales=scales)
        g = conv_pm.pack_g3_pair(w.reshape(c, c * 9), c)
        xe, xo = conv_pm.to_pm_planes(jnp.asarray(x))
        kw = {}
        if with_res:
            kw = dict(residual=conv_pm.to_pm_planes(jnp.asarray(res)),
                      res_scales=scales)
        oe, oo = conv_pm.conv3x3_pm2(
            xe, xo, jnp.asarray(g), jnp.asarray(bias),
            jnp.asarray(factors), n=n, relu=relu, interpret=True, **kw)
        got = np.asarray(conv_pm.from_pm_planes(oe, oo, n))
        np.testing.assert_array_equal(got, ref)
