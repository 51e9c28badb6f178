"""Batch-minor ring-staged 3x3 conv engine (ops/conv_bm.py) vs the
golden composition — hermetic (kernel under the Pallas interpreter).

The engine replaces XLA's C_out=64-capped stage-1 convs; its contract
is conv2d_int8(kernel=3, stride=1, padding=1) [+ add_residual] per the
reference semantics (golden_models.cpp:378-410, :465-495).  On-chip
exactness + timing: tools/conv_bm_probe.py.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu.ops.conv import conv2d_int8
from resnet_accel_tpu.ops.conv_bm import (conv3x3_bm, nchw_of_rowvec,
                                          pack_weights_bm,
                                          rowvec_of_nchw)
from resnet_accel_tpu.ops.epilogue import add_residual

C = 64


def _mk(N=128, H=8, W=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(-128, 128, (N, C, H, W)).astype(np.int8)
    w2d = rng.integers(-64, 64, (C, C * 9)).astype(np.int8)
    bias = rng.integers(-8000, 8000, C).astype(np.int32)
    f = rng.uniform(0.001, 0.01, C).astype(np.float32)
    return x, w2d, bias, f


def _golden(x, w2d, bias, f, relu):
    return np.asarray(conv2d_int8(
        jnp.asarray(x), jnp.asarray(w2d), bias=jnp.asarray(bias),
        kernel=3, stride=1, padding=1, factors=jnp.asarray(f),
        relu=relu, use_pallas=False, backend="cpu"))


def test_rowvec_roundtrip():
    x, *_ = _mk(N=256, H=4, W=6, seed=3)
    xr = rowvec_of_nchw(jnp.asarray(x))
    assert xr.shape == (4, C, 256 * 6)
    np.testing.assert_array_equal(
        np.asarray(nchw_of_rowvec(xr, 256)), x)


@pytest.mark.parametrize("relu", [True, False])
def test_conv_matches_golden(relu):
    x, w2d, bias, f = _mk(seed=1)
    xr = rowvec_of_nchw(jnp.asarray(x))
    w9 = pack_weights_bm(w2d, C)
    out = conv3x3_bm(xr, w9, jnp.asarray(bias), jnp.asarray(f),
                     width=8, relu=relu, kernel_interpret=True)
    got = np.asarray(nchw_of_rowvec(out, 128))
    np.testing.assert_array_equal(got, _golden(x, w2d, bias, f, relu))


def test_conv_residual_join_matches_golden():
    """The fused residual epilogue == requantize(relu=False) then
    golden add_residual(relu=True), divide and verified-reciprocal
    variants both."""
    x, w2d, bias, f = _mk(seed=2)
    r = _mk(seed=4)[0]
    s_main, s_res, s_out = 0.11, 0.07, 0.15
    m = _golden(x, w2d, bias, f, relu=False)
    want = np.asarray(add_residual(
        jnp.asarray(m), jnp.asarray(r), s_main, s_res, s_out,
        relu=True))
    xr = rowvec_of_nchw(jnp.asarray(x))
    rr = rowvec_of_nchw(jnp.asarray(r))
    w9 = pack_weights_bm(w2d, C)
    from resnet_accel_tpu.ops.epilogue import exact_inv_out_scale
    proof = exact_inv_out_scale(s_main, s_res, s_out)
    invs = [None] + ([proof] if proof is not None else [])
    for inv in invs:
        out = conv3x3_bm(xr, w9, jnp.asarray(bias), jnp.asarray(f),
                         width=8, relu=True, residual=rr,
                         res_scales=(s_main, s_res, s_out, inv),
                         kernel_interpret=True)
        got = np.asarray(nchw_of_rowvec(out, 128))
        # with a proof the reciprocal multiply is bit-identical to the
        # divide, so both variants must equal the golden
        np.testing.assert_array_equal(got, want)


def test_qslice_out_layout():
    x, w2d, bias, f = _mk(seed=5)
    xr = rowvec_of_nchw(jnp.asarray(x))
    w9 = pack_weights_bm(w2d, C)
    rv = conv3x3_bm(xr, w9, jnp.asarray(bias), jnp.asarray(f),
                    width=8, relu=True, kernel_interpret=True)
    qs = conv3x3_bm(xr, w9, jnp.asarray(bias), jnp.asarray(f),
                    width=8, relu=True, out_layout="qslice",
                    kernel_interpret=True)
    # qslice is (H, W, C, N) — the stem's XLA-consumable layout
    np.testing.assert_array_equal(
        np.asarray(qs.transpose(3, 2, 0, 1)),
        np.asarray(nchw_of_rowvec(rv, 128)))


def test_gates():
    xr = jnp.zeros((8, C, 8 * 128), jnp.int8)
    w9 = jnp.zeros((9, C, C), jnp.int8)
    b = jnp.zeros(C, jnp.int32)
    f = jnp.ones(C, jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        conv3x3_bm(xr, w9, b, f, width=7)
    with pytest.raises(ValueError, match="out_layout"):
        conv3x3_bm(xr, w9, b, f, width=8, out_layout="nope")
    with pytest.raises(ValueError, match="together"):
        conv3x3_bm(xr, w9, b, f, width=8, residual=xr)


def test_bm_trunk_in_model_matches_base():
    """make_forward(bm_trunk=True): fused stem (rowvec) -> batch-minor
    b0/b1 with fused residual joins -> qslice handoff, logits
    bit-identical to the reference composition.

    Both forwards are jitted (the canonical usage): a traced constant
    divide and an eager divide can differ by 1 ulp at rint-tie inputs
    (XLA strength-reduces x/const to a reciprocal multiply; the TPU's
    f32 divide is itself a reciprocal sequence — see
    docs/ARCHITECTURE.md "division semantics"), so mixing eager and
    traced paths is NOT the contract."""
    import jax
    from resnet_accel_tpu.models.resnet18 import (init_resnet18_fp32,
                                                  make_forward,
                                                  quantize_resnet18)
    rng = np.random.default_rng(7)
    params = init_resnet18_fp32(seed=2, num_classes=10,
                                small_input=False)
    calib = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet18(params, calib, 10, small_input=False)
    x = rng.normal(0, 1, (128, 3, 32, 32)).astype(np.float32)
    pd = model.as_device_params()
    base = np.asarray(jax.jit(make_forward(model, use_pallas=False,
                                           backend="cpu"))(
        pd, jnp.asarray(x)))
    bm = np.asarray(jax.jit(make_forward(model, use_pallas=False,
                                         backend="cpu",
                                         stem_fused=True,
                                         bm_trunk=True))(
        pd, jnp.asarray(x)))
    np.testing.assert_array_equal(bm, base)


def test_block_kernel_matches_composition():
    """block3x3_bm (c1 -> c2 -> join in one pass, c1 out never in HBM)
    == conv(c1,relu) -> conv(c2) -> add_residual, divide and proven-
    reciprocal variants."""
    from resnet_accel_tpu.ops.conv_bm import block3x3_bm
    from resnet_accel_tpu.ops.epilogue import exact_inv_out_scale

    x, w2d1, b1, f1 = _mk(seed=8)
    _, w2d2, b2, f2 = _mk(seed=9)
    s_main, s_res, s_out = 0.13, 0.06, 0.17
    y1 = _golden(x, w2d1, b1, f1, relu=True)
    y2 = _golden(y1, w2d2, b2, f2, relu=False)
    want = np.asarray(add_residual(
        jnp.asarray(y2), jnp.asarray(x), s_main, s_res, s_out,
        relu=True))
    xr = rowvec_of_nchw(jnp.asarray(x))
    w91 = pack_weights_bm(w2d1, C)
    w92 = pack_weights_bm(w2d2, C)
    proof = exact_inv_out_scale(s_main, s_res, s_out)
    for inv in [None] + ([proof] if proof is not None else []):
        out = block3x3_bm(xr, w91, jnp.asarray(b1), jnp.asarray(f1),
                          w92, jnp.asarray(b2), jnp.asarray(f2),
                          width=8, res_scales=(s_main, s_res, s_out,
                                               inv),
                          kernel_interpret=True)
        got = np.asarray(nchw_of_rowvec(out, 128))
        np.testing.assert_array_equal(got, want)
    # qslice exit layout
    qs = block3x3_bm(xr, w91, jnp.asarray(b1), jnp.asarray(f1),
                     w92, jnp.asarray(b2), jnp.asarray(f2),
                     width=8, res_scales=(s_main, s_res, s_out, None),
                     out_layout="qslice", kernel_interpret=True)
    np.testing.assert_array_equal(np.asarray(qs.transpose(3, 2, 0, 1)),
                                  want)


def test_stacked_pack_layout():
    from resnet_accel_tpu.ops.conv_bm import pack_weights_bm_stacked
    w2d = (np.arange(C * C * 9).reshape(C, C * 9) % 127).astype(np.int8)
    w4 = w2d.reshape(C, C, 3, 3)
    w3 = np.asarray(pack_weights_bm_stacked(w2d, C))
    assert w3.shape == (3, 2 * C, 4 * C)
    for kw in range(3):
        for kh in range(3):
            np.testing.assert_array_equal(
                w3[kw, :C, kh * C:(kh + 1) * C], w4[:, :, kh, kw])
            np.testing.assert_array_equal(
                w3[kw, C:, (kh + 1) * C:(kh + 2) * C], w4[:, :, kh, kw])
        np.testing.assert_array_equal(w3[kw, :C, 3 * C:], 0)
        np.testing.assert_array_equal(w3[kw, C:, :C], 0)


@pytest.mark.parametrize("relu", [True, False])
def test_stacked_conv_matches_golden(relu):
    from resnet_accel_tpu.ops.conv_bm import (conv3x3_bm_stacked,
                                              pack_weights_bm_stacked)
    x, w2d, bias, f = _mk(seed=13)
    xr = rowvec_of_nchw(jnp.asarray(x))
    w3 = pack_weights_bm_stacked(w2d, C)
    out = conv3x3_bm_stacked(xr, w3, jnp.asarray(bias), jnp.asarray(f),
                             width=8, relu=relu, kernel_interpret=True)
    got = np.asarray(nchw_of_rowvec(out, 128))
    np.testing.assert_array_equal(got, _golden(x, w2d, bias, f, relu))


def test_stacked_residual_and_qslice():
    from resnet_accel_tpu.ops.conv_bm import (conv3x3_bm_stacked,
                                              pack_weights_bm_stacked)
    x, w2d, bias, f = _mk(seed=14)
    r = _mk(seed=15)[0]
    s_main, s_res, s_out = 0.12, 0.08, 0.19
    m = _golden(x, w2d, bias, f, relu=False)
    want = np.asarray(add_residual(
        jnp.asarray(m), jnp.asarray(r), s_main, s_res, s_out,
        relu=True))
    xr = rowvec_of_nchw(jnp.asarray(x))
    rr = rowvec_of_nchw(jnp.asarray(r))
    w3 = pack_weights_bm_stacked(w2d, C)
    out = conv3x3_bm_stacked(xr, w3, jnp.asarray(bias), jnp.asarray(f),
                             width=8, relu=True, residual=rr,
                             res_scales=(s_main, s_res, s_out, None),
                             kernel_interpret=True)
    np.testing.assert_array_equal(np.asarray(nchw_of_rowvec(out, 128)),
                                  want)
    qs = conv3x3_bm_stacked(xr, w3, jnp.asarray(bias), jnp.asarray(f),
                            width=8, relu=True, residual=rr,
                            res_scales=(s_main, s_res, s_out, None),
                            out_layout="qslice", kernel_interpret=True)
    np.testing.assert_array_equal(np.asarray(qs.transpose(3, 2, 0, 1)),
                                  want)


def test_bm_stacked_route_in_model_matches_base():
    import jax
    from resnet_accel_tpu.models.resnet18 import (init_resnet18_fp32,
                                                  make_forward,
                                                  quantize_resnet18)
    rng = np.random.default_rng(17)
    params = init_resnet18_fp32(seed=3, num_classes=10,
                                small_input=False)
    calib = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet18(params, calib, 10, small_input=False)
    x = rng.normal(0, 1, (128, 3, 32, 32)).astype(np.float32)
    pd = model.as_device_params()
    base = np.asarray(jax.jit(make_forward(model, use_pallas=False,
                                           backend="cpu"))(
        pd, jnp.asarray(x)))
    st = np.asarray(jax.jit(make_forward(
        model, use_pallas=False, backend="cpu", stem_fused=True,
        bm_trunk=True, conv_routes={"bm": "stacked"}))(
        pd, jnp.asarray(x)))
    np.testing.assert_array_equal(st, base)
