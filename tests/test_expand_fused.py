"""Fused bottleneck expansion kernel (ops/expand_fused.py).

Bit-exactness contract: expand_add_int8 == conv2d_int8(kernel=1,
relu=False, factors) -> add_residual(relu=True), the golden
requantize/add_residual semantics (reference golden_models.cpp:378-410,
:465-495).  The kernel itself runs here in Pallas interpret mode — the
same code path the TPU compiles — at small geometry.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from resnet_accel_tpu.ops.conv import conv2d_int8
from resnet_accel_tpu.ops.epilogue import add_residual, exact_inv_out_scale
from resnet_accel_tpu.ops.expand_fused import expand_add_int8


def _ref(x, w, b, f, r, sm, sr, so, inv=None):
    y = conv2d_int8(x, w, bias=b, kernel=1, stride=1, padding=0,
                    factors=np.asarray(f), relu=False,
                    use_pallas=False, backend="cpu")
    return np.asarray(add_residual(y, r, sm, sr, so, relu=True,
                                   inv_out_scale=inv))


@pytest.mark.parametrize("cin,cout,h,w", [(16, 32, 4, 5), (8, 16, 3, 7),
                                          (32, 64, 2, 2)])
def test_kernel_bit_exact_vs_composition(cin, cout, h, w):
    rng = np.random.default_rng(cin + h)
    x = jnp.asarray(rng.integers(-128, 128, (128, cin, h, w)), jnp.int8)
    wt = jnp.asarray(rng.integers(-128, 128, (cout, cin)), jnp.int8)
    b = jnp.asarray(rng.integers(-1000, 1000, (cout,)), jnp.int32)
    f = jnp.asarray(rng.uniform(0.001, 0.01, (cout,)).astype(np.float32))
    r = jnp.asarray(rng.integers(-128, 128, (128, cout, h, w)), jnp.int8)
    sm, sr, so = 0.05, 0.061, 0.043
    got = np.asarray(expand_add_int8(x, wt, b, f, r, sm, sr, so,
                                     interpret=True))
    np.testing.assert_array_equal(got, _ref(x, wt, b, f, r, sm, sr, so))


def test_kernel_with_verified_reciprocal():
    rng = np.random.default_rng(3)
    sm, sr, so = 0.05, 0.06, 0.07
    inv = exact_inv_out_scale(sm, sr, so)
    assert inv is not None
    x = jnp.asarray(rng.integers(-128, 128, (128, 16, 4, 4)), jnp.int8)
    wt = jnp.asarray(rng.integers(-128, 128, (32, 16)), jnp.int8)
    b = jnp.asarray(rng.integers(-500, 500, (32,)), jnp.int32)
    f = jnp.asarray(rng.uniform(0.001, 0.01, (32,)).astype(np.float32))
    r = jnp.asarray(rng.integers(-128, 128, (128, 32, 4, 4)), jnp.int8)
    got = np.asarray(expand_add_int8(x, wt, b, f, r, sm, sr, so,
                                     inv_out=inv, interpret=True))
    np.testing.assert_array_equal(
        got, _ref(x, wt, b, f, r, sm, sr, so, inv=inv))


def test_geometry_guard():
    x = jnp.zeros((64, 8, 2, 2), jnp.int8)      # N % 128 != 0
    wt = jnp.zeros((16, 8), jnp.int8)
    r = jnp.zeros((64, 16, 2, 2), jnp.int8)
    with pytest.raises(ValueError):
        expand_add_int8(x, wt, jnp.zeros((16,), jnp.int32),
                        jnp.ones((16,), jnp.float32), r, 1.0, 1.0, 1.0,
                        interpret=True)


def test_resnet50_forward_with_fused_expansion_golden_exact():
    """The full -50 small-input forward with expand_fused=True (the real
    kernel, interpret mode) matches the numpy golden bit-for-bit."""
    from resnet_accel_tpu.models.resnet import (init_resnet_fp32,
                                                quantize_resnet)
    from resnet_accel_tpu.models.resnet18 import (make_forward,
                                                  forward_golden)
    rng = np.random.default_rng(0)
    pf = init_resnet_fp32(depth=50, seed=0, small_input=True)
    calib = rng.normal(0, 1, (4, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet(pf, calib, depth=50, small_input=True)
    x = rng.normal(0, 1, (128, 3, 32, 32)).astype(np.float32)
    fwd = make_forward(model, backend="cpu", expand_fused=True)
    got = np.asarray(fwd(model.as_device_params(), x))
    np.testing.assert_array_equal(got, forward_golden(model, x))
