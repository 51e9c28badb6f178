"""Fused stem Pallas kernel vs the unfused reference pipeline.

The kernel is a documented negative perf result (see ops/fused_stem.py)
but its numerics contract — bit-exact equality with
quantize_input + space-to-depth conv2d_int8 + maxpool2d_int8 — is part
of the op surface and must hold for every band count and pool mode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from resnet_accel_tpu.models.resnet18 import (
    init_resnet18_fp32,
    quantize_resnet18,
)
from resnet_accel_tpu.ops.conv import (
    conv2d_int8,
    space_to_depth_nchw,
    stem_s2d_weights,
)
from resnet_accel_tpu.ops.epilogue import quantize_input
from resnet_accel_tpu.ops.fused_stem import (
    fused_stem_pool,
    space_to_depth_nhwc_from_nchw,
    stem_gemm_weights,
)
from resnet_accel_tpu.ops.pooling import maxpool2d_int8


@pytest.fixture(scope="module")
def stem_setup():
    rng = np.random.default_rng(11)
    fp32 = init_resnet18_fp32(seed=3, num_classes=10, small_input=False)
    calib = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
    model = quantize_resnet18(fp32, calib, 10, small_input=False)
    params = {k: jnp.asarray(v) for k, v in
              model.as_device_params().items()}
    x = jnp.asarray(rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32))
    return model, params, x


def _reference(model, params, x, pool):
    q = quantize_input(x, model.s_input)
    w = stem_s2d_weights(params["stem.w"], 3, 7)
    y = conv2d_int8(
        space_to_depth_nchw(q), w, bias=params["stem.b"], kernel=4,
        stride=1, padding=((2, 1), (2, 1)), factors=params["stem.f"],
        relu=model.stem.relu, method="native", use_pallas=False)
    if pool:
        y = maxpool2d_int8(y, 3, 2, padding=1)
    return np.asarray(y)


@pytest.mark.parametrize("bands", [1, 2, 4, 7])
def test_pooled_bit_exact(stem_setup, bands):
    model, params, x = stem_setup
    ref = _reference(model, params, x, pool=True)
    out = fused_stem_pool(
        x, params["stem.w"], params["stem.b"], params["stem.f"],
        model.s_input, relu=model.stem.relu, bands=bands, interpret=True)
    np.testing.assert_array_equal(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref)


def test_unpooled_bit_exact(stem_setup):
    model, params, x = stem_setup
    ref = _reference(model, params, x, pool=False)
    out = fused_stem_pool(
        x, params["stem.w"], params["stem.b"], params["stem.f"],
        model.s_input, relu=model.stem.relu, pool=False, interpret=True)
    np.testing.assert_array_equal(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref)


def test_gemm_weight_reorder_roundtrip(stem_setup):
    model, params, _ = stem_setup
    w_gemm = np.asarray(stem_gemm_weights(params["stem.w"], 3, 7))
    w_s2d = np.asarray(stem_s2d_weights(params["stem.w"], 3, 7))
    O = w_s2d.shape[0]
    # Undo (kh, kw, c16) -> compare against (c12, kh, kw).
    w4 = w_gemm.reshape(4, 4, 16, O)
    assert np.array_equal(w4[:, :, 12:, :], np.zeros((4, 4, 4, O)))
    back = w4[:, :, :12, :].transpose(3, 2, 0, 1).reshape(O, -1)
    assert np.array_equal(back, w_s2d)


def test_s2d_channel_order(stem_setup):
    _, _, x = stem_setup
    q = quantize_input(x, 0.05)
    a = np.asarray(space_to_depth_nchw(q))           # [N, 12, H/2, W/2]
    b = np.asarray(space_to_depth_nhwc_from_nchw(q))  # [N, H/2, W/2, 12]
    np.testing.assert_array_equal(a, b.transpose(0, 3, 1, 2))


def test_invalid_geometry_raises(stem_setup):
    model, params, _ = stem_setup
    bad = jnp.zeros((1, 3, 30, 30), jnp.float32)
    with pytest.raises(ValueError, match="divisible by 4"):
        fused_stem_pool(bad, params["stem.w"], params["stem.b"],
                        params["stem.f"], model.s_input, interpret=True)
    ok = jnp.zeros((1, 3, 32, 32), jnp.float32)
    with pytest.raises(ValueError, match="must divide"):
        fused_stem_pool(ok, params["stem.w"], params["stem.b"],
                        params["stem.f"], model.s_input, bands=3,
                        interpret=True)