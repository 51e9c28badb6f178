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
