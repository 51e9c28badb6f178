"""Space-to-depth stem transform — bit-exact vs the direct 7x7/s2 conv."""

import numpy as np
import jax.numpy as jnp

from resnet_accel_tpu import golden
from resnet_accel_tpu.models import resnet18 as r18
from resnet_accel_tpu.ops.conv import (
    conv2d_int8,
    space_to_depth_nchw,
    space_to_depth_nhwc,
    stem_s2d_weights,
)


class TestS2DOp:
    def test_space_to_depth_packing(self):
        x = np.arange(2 * 3 * 4 * 4, dtype=np.int8).reshape(2, 3, 4, 4)
        s = np.asarray(space_to_depth_nchw(jnp.asarray(x)))
        assert s.shape == (2, 12, 2, 2)
        # channel c*4 + pa*2 + pb holds x[c, 2i+pa, 2j+pb]
        np.testing.assert_array_equal(s[0, 0], x[0, 0, ::2, ::2])
        np.testing.assert_array_equal(s[0, 1], x[0, 0, ::2, 1::2])
        np.testing.assert_array_equal(s[0, 2], x[0, 0, 1::2, ::2])
        np.testing.assert_array_equal(s[0, 7], x[0, 1, 1::2, 1::2])

    def test_bit_exact_vs_direct_7x7(self):
        rng = np.random.default_rng(0)
        O, C, H = 64, 3, 32
        w2d = rng.integers(-128, 128, (O, C * 49)).astype(np.int8)
        x = rng.integers(-128, 128, (2, C, H, H)).astype(np.int8)
        direct = np.asarray(conv2d_int8(
            jnp.asarray(x), jnp.asarray(w2d), kernel=7, stride=2,
            padding=3))
        ws = stem_s2d_weights(w2d, C, 7)
        out = np.asarray(conv2d_int8(
            space_to_depth_nchw(jnp.asarray(x)), jnp.asarray(ws),
            kernel=4, stride=1, padding=((2, 1), (2, 1))))
        np.testing.assert_array_equal(out, direct)
        # and both match the scalar golden
        g = np.stack([golden.conv2d_int8_simple(
            x[i], w2d.reshape(O, C, 7, 7), None, 2, 3) for i in range(2)])
        np.testing.assert_array_equal(direct, g)


class TestS2DModel:
    def test_forward_matches_non_s2d(self):
        rng = np.random.default_rng(1)
        fp32 = r18.init_resnet18_fp32(seed=0, num_classes=10,
                                      small_input=False)
        calib = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
        model = r18.quantize_resnet18(fp32, calib, 10, small_input=False)
        params = model.as_device_params()
        x = jnp.asarray(rng.normal(0, 1, (1, 3, 224, 224)),
                        jnp.float32)
        a = np.asarray(r18.make_forward(model, stem_s2d=True)(params, x))
        b = np.asarray(r18.make_forward(model, stem_s2d=False)(params, x))
        np.testing.assert_array_equal(a, b)

    def test_nhwc_s2d_matches_nchw(self):
        rng = np.random.default_rng(2)
        fp32 = r18.init_resnet18_fp32(seed=0, num_classes=10,
                                      small_input=False)
        calib = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
        model = r18.quantize_resnet18(fp32, calib, 10, small_input=False)
        params = model.as_device_params()
        x = jnp.asarray(rng.normal(0, 1, (1, 3, 224, 224)),
                        jnp.float32)
        a = np.asarray(r18.make_forward(model, layout="NHWC",
                                        stem_s2d=True)(params, x))
        b = np.asarray(r18.make_forward(model, stem_s2d=False)(params, x))
        np.testing.assert_array_equal(a, b)

    def test_space_to_depth_nhwc_matches_nchw(self):
        x = np.arange(2 * 3 * 4 * 4, dtype=np.int8).reshape(2, 3, 4, 4)
        via_nchw = np.asarray(space_to_depth_nchw(jnp.asarray(x)))
        xh = jnp.asarray(x.transpose(0, 2, 3, 1))
        via_nhwc = np.asarray(space_to_depth_nhwc(xh))
        np.testing.assert_array_equal(
            via_nhwc, via_nchw.transpose(0, 2, 3, 1))


class TestFold2StemPool:
    """Row-pair-folded stem conv+pool (stem_conv_pool_fold2) — bit-exact
    vs the composed conv2d_int8 + maxpool2d_int8 path.  (Measured slower
    on chip than the unfolded route — kept as a documented negative
    result, docs/ARCHITECTURE.md §7.)"""

    def _case(self, seed, H=24, W=28, relu=True, bias=True, perch=True,
              method="native"):
        from resnet_accel_tpu.ops.conv import stem_conv_pool_fold2
        from resnet_accel_tpu.ops.pooling import maxpool2d_int8
        rng = np.random.default_rng(seed)
        C, O, k = 12, 64, 4
        pad = ((2, 1), (2, 1))
        x = jnp.asarray(rng.integers(-128, 128, (2, C, H, W), dtype=np.int8))
        w = jnp.asarray(rng.integers(-128, 128, (O, C * k * k),
                                     dtype=np.int8))
        b = (jnp.asarray(rng.integers(-2000, 2000, (O,), dtype=np.int32))
             if bias else None)
        f = (jnp.asarray(rng.uniform(1e-4, 5e-4, (O,)).astype(np.float32))
             if perch else jnp.float32(2e-4))
        ref = maxpool2d_int8(
            conv2d_int8(x, w, bias=b, kernel=k, stride=1, padding=pad,
                        factors=f, relu=relu), 3, 2, padding=1)
        got = stem_conv_pool_fold2(x, w, b, kernel=k, padding=pad,
                                   factors=f, relu=relu, method=method)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_bit_exact(self):
        self._case(0)

    def test_no_relu_pad_semantics(self):
        # negative outputs exercise the folded pool's -128 pad rows
        self._case(1, relu=False)

    def test_scalar_factor_no_bias(self):
        self._case(2, bias=False, perch=False)

    def test_bf16_route_exact(self):
        self._case(3, method="bf16")

    def test_odd_width(self):
        self._case(4, W=30, H=16)
