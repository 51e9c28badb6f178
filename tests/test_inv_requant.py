"""Verified-reciprocal residual requant (ops/epilogue.exact_inv_out_scale).

The golden residual add divides by out_scale (reference
golden_models.cpp:465-495); the TPU forward may requantize by multiply
ONLY under an exhaustive per-scale-triple proof.  These tests pin the
proof itself: agreement with brute force, bit-identical add_residual
output when a proof exists, rejection of a known boundary-crossing
triple, and the end-to-end forward staying golden-exact.
"""
import numpy as np
import pytest

from resnet_accel_tpu.ops import add_residual, exact_inv_out_scale

ALL = np.arange(-128, 128, dtype=np.int8)
Y, R = np.meshgrid(ALL, ALL, indexing="ij")


def _golden_divide(y, r, sm, sr, so):
    s = (y.astype(np.float32) * np.float32(sm)
         + r.astype(np.float32) * np.float32(sr))
    q = np.clip(np.rint(s / np.float32(so)), -128, 127)
    return q.astype(np.int8)


def test_proof_means_bit_identical_everywhere():
    """When the proof passes, the multiply path matches the golden
    divide on EVERY (main, residual) int8 pair."""
    rng = np.random.default_rng(7)
    proven = 0
    for _ in range(50):
        sm, sr, so = rng.uniform(0.001, 0.2, 3)
        inv = exact_inv_out_scale(sm, sr, so)
        if inv is None:
            continue
        proven += 1
        got = np.asarray(add_residual(Y, R, sm, sr, so,
                                      inv_out_scale=inv))
        ref = np.asarray(add_residual(Y, R, sm, sr, so))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(ref, _golden_divide(Y, R, sm, sr, so))
    assert proven >= 30          # the proof is the common case


def test_boundary_triple_rescued_by_neighbour():
    """A scale triple where the PLAIN reciprocal fails the exhaustive
    check (found by search).  The raw multiply diverges somewhere —
    and since round 5 the verifier also tries the reciprocal's 1-ulp
    neighbours, one of which passes here, so the triple gets a proof
    anyway.  Whatever is returned must satisfy the exhaustive property
    itself — the verifier, not the candidate, keeps the fast path
    honest."""
    sm, sr, so = (0.01538078784044548, 0.10049459190806509,
                  0.149075398377247)
    s = (Y.astype(np.float32) * np.float32(sm)
         + R.astype(np.float32) * np.float32(sr))
    qd = np.clip(np.rint(s / np.float32(so)), -128, 127)
    # the plain reciprocal diverges somewhere:
    inv0 = np.float32(1.0) / np.float32(so)
    assert not np.array_equal(qd, np.clip(np.rint(s * inv0), -128, 127))
    # ...but the proof search finds a verified neighbour:
    inv = exact_inv_out_scale(sm, sr, so)
    assert inv is not None and np.float32(inv) != inv0
    np.testing.assert_array_equal(
        qd, np.clip(np.rint(s * np.float32(inv)), -128, 127))


def test_relu_and_dtype():
    inv = exact_inv_out_scale(0.05, 0.06, 0.07)
    if inv is None:
        pytest.skip("triple not provable (environment float quirk)")
    out = np.asarray(add_residual(Y, R, 0.05, 0.06, 0.07, relu=True,
                                  inv_out_scale=inv))
    assert out.dtype == np.int8
    assert out.min() >= 0
    ref = np.asarray(add_residual(Y, R, 0.05, 0.06, 0.07, relu=True))
    np.testing.assert_array_equal(out, ref)


def test_forward_uses_proof_and_stays_golden_exact():
    """ResNet forward with per-block verified reciprocals still matches
    the numpy golden logits bit-for-bit (small geometry, CPU)."""
    from resnet_accel_tpu.models.resnet import (init_resnet_fp32,
                                                quantize_resnet)
    from resnet_accel_tpu.models import resnet18 as r18
    rng = np.random.default_rng(0)
    pf = init_resnet_fp32(depth=50, seed=0, small_input=True)
    calib = rng.normal(0, 1, (4, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet(pf, calib, depth=50, small_input=True)
    # at least one block should carry a proven reciprocal
    invs = [exact_inv_out_scale(b.s_main, b.s_res, b.s_out)
            for b in model.blocks]
    assert any(v is not None for v in invs)
    x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    fwd = r18.make_forward(model, backend="cpu")
    got = np.asarray(fwd(model.as_device_params(), x))
    np.testing.assert_array_equal(got, r18.forward_golden(model, x))


def test_exact_pow2_inv():
    """pow2 scales get an exact reciprocal; everything else None."""
    from resnet_accel_tpu.ops.epilogue import exact_pow2_inv, pow2_scale

    for k in range(-20, 21):
        s = float(2.0 ** k)
        inv = exact_pow2_inv(s)
        assert inv == 1.0 / s
        # x/s == x*inv bit-for-bit on a hostile sample: subnormals,
        # huge values, tie-boundary neighborhoods
        rng = np.random.default_rng(k + 100)
        x = np.concatenate([
            rng.normal(0, 1, 4096).astype(np.float32),
            (rng.integers(-200, 200, 512).astype(np.float32) + 0.5) * s,
            np.float32([1e-38, -1e-38, 3e38, -3e38, 0.0]),
        ]).astype(np.float32)
        np.testing.assert_array_equal(x / np.float32(s),
                                      x * np.float32(inv))
    for s in (3 / 127, 0.1, 0.05, 1e-12, 0.75):
        assert exact_pow2_inv(s) is None
    assert exact_pow2_inv(0.0) is None
    assert exact_pow2_inv(-1.0) is None

    # pow2_scale: snaps UP, idempotent on pow2, and always verifiable
    assert pow2_scale(0.03) == 0.03125
    assert pow2_scale(0.03125) == 0.03125
    assert pow2_scale(0.04) == 0.0625
    for s in (3 / 127, 0.1, 1e-9, 123.4):
        p = pow2_scale(s)
        assert p >= s
        assert p < 2 * s
        assert exact_pow2_inv(p) is not None


def test_pow2_input_scale_calibration():
    """quantize_resnet18(pow2_input_scale=True) produces a pow2 input
    scale and a model whose forward stays golden-exact (all downstream
    constants derive from the snapped scale)."""
    from resnet_accel_tpu.models.resnet18 import (init_resnet18_fp32,
                                                  make_forward,
                                                  quantize_resnet18)
    from resnet_accel_tpu.ops.epilogue import exact_pow2_inv

    rng = np.random.default_rng(0)
    fp32 = init_resnet18_fp32(seed=0, num_classes=10, small_input=True)
    calib = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    m = quantize_resnet18(fp32, calib, 10, small_input=True,
                          pow2_input_scale=True)
    assert exact_pow2_inv(m.s_input) is not None
    x = rng.normal(0, 1, (4, 3, 32, 32)).astype(np.float32)
    dev = make_forward(m, use_pallas=False)
    golden = make_forward(m, use_pallas=False, backend="cpu")
    np.testing.assert_array_equal(np.asarray(dev(m.as_device_params(),
                                                 x)),
                                  np.asarray(golden(
                                      m.as_device_params(), x)))
