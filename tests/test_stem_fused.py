"""Fused stem-complex kernel (ops/stem_fused.py): weight packing and
window algebra vs the golden composition (numpy simulation of the
kernel's exact dot/ring formulation), and the interpret fallback.

The Mosaic lowering itself is validated on-chip (tools/
stem_fused_check.py, bit-exact vs the shipping composition); these
tests pin the MATH hermetically so an on-chip mismatch can only be a
lowering bug, never an algebra bug.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu.ops.stem_fused import (RING, pack_stem_weights,
                                             stem_conv_pool_nm)
from resnet_accel_tpu.ops.conv import stem_s2d_weights


def _golden_stem(x, w2d, bias, factors, scale):
    """Reference composition on CPU (the bit-exactness contract)."""
    from resnet_accel_tpu.ops.conv import conv2d_int8
    from resnet_accel_tpu.ops.pooling import maxpool2d_int8
    from resnet_accel_tpu.ops.stem_pack import quantize_s2d_nm
    s = quantize_s2d_nm(jnp.asarray(x), scale, interpret=True)
    a = conv2d_int8(s, jnp.asarray(w2d), bias=jnp.asarray(bias),
                    kernel=4, stride=1, padding=((2, 1), (2, 1)),
                    factors=jnp.asarray(factors), relu=True,
                    use_pallas=False, backend="cpu")
    return np.asarray(maxpool2d_int8(a, 3, 2, padding=1))


def _make_inputs(N, H, W, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (N, 3, H, W)).astype(np.float32)
    w = rng.integers(-127, 128, (64, 3 * 49)).astype(np.int8)
    w2d = np.asarray(stem_s2d_weights(jnp.asarray(w), 3, 7))
    bias = rng.integers(-5000, 5000, 64).astype(np.int32)
    factors = rng.uniform(0.001, 0.01, 64).astype(np.float32)
    scale = float(np.abs(x).max() / 127.0)
    return x, w2d, bias, factors, scale


def _simulate_kernel(x, w2d, bias, factors, scale):
    """Numpy re-enactment of the kernel's staging + window dots +
    int32 pool + requant — byte-for-byte the kernel's algebra."""
    N, _, H, W = x.shape
    nq, pooled = W // 4, H // 4
    lanes = nq * N
    wle, whe, wlo, who = (np.asarray(m, np.int32)
                          for m in pack_stem_weights(w2d))
    NEG = -(2 ** 30)

    # staging: quantized (E, O) parity planes per s2d row
    xt = np.pad(x.transpose(1, 2, 3, 0), ((0, 0), (2, 2), (0, 0),
                                          (0, 0)))
    q = np.clip(np.rint(xt / scale), -128, 127).astype(np.int8)

    def stage(r):
        """ringA group [32, (nq+2)*N] and ringB group for s2d row r."""
        ga = np.zeros((32, (nq + 2) * N), np.int8)
        gb = np.zeros((32, (nq + 2) * N), np.int8)
        ch = 0
        for c in range(3):
            for rp in range(2):
                for cp in range(2):
                    row = q[c, 2 * r + rp + 2]        # padded coords
                    e = row[cp::4].reshape(lanes)
                    o = row[cp + 2::4].reshape(lanes)
                    ga[ch, 2 * N:2 * N + lanes] = e
                    ga[16 + ch, 2 * N:2 * N + lanes] = o
                    gb[ch, 2 * N:2 * N + lanes] = o
                    gb[16 + ch, N:N + lanes] = e
                    ch += 1
        return ga, gb

    groups = {r: stage(r) for r in range(-1, H // 2 + 1)}
    zero = (np.zeros((32, (nq + 2) * N), np.int8),) * 2
    out = np.zeros((pooled, nq, 64, N), np.int8)
    carry = np.full((64, lanes), NEG, np.int64)

    def colmax_of(h):
        wa = np.concatenate([groups.get(h - 2 + i, zero)[0]
                             for i in range(4)]).astype(np.int32)
        wb = np.concatenate([groups.get(h - 2 + i, zero)[1]
                             for i in range(4)]).astype(np.int32)
        acc_e = wle @ wa[:, N:N + lanes] + whe @ wa[:, 2 * N:2 * N + lanes]
        acc_o = wlo @ wb[:, 0:N + lanes] + who @ wb[:, N:2 * N + lanes]
        acc_o[:, 0:N] = NEG
        return np.maximum(np.maximum(acc_o[:, 0:lanes], acc_e),
                          acc_o[:, N:N + lanes])

    for p in range(pooled):
        cm0, cm1 = colmax_of(2 * p), colmax_of(2 * p + 1)
        pool = np.maximum(np.maximum(carry, cm0), cm1)
        carry = cm1
        acc = np.maximum(pool + bias[:, None], 0)
        q8 = np.clip(np.rint(acc.astype(np.float32)
                             * factors[:, None]), -128, 127
                     ).astype(np.int8)
        out[p] = q8.reshape(64, nq, N).transpose(1, 0, 2)
    return out.transpose(3, 2, 0, 1)


@pytest.mark.parametrize("H,W", [(16, 16), (32, 24), (224, 224)])
def test_window_algebra_matches_golden(H, W):
    """The kernel's exact dot/ring/pool algebra (numpy) == the shipping
    composition, at ImageNet geometry and small odd shapes."""
    N = 4 if H < 224 else 2          # numpy sim: small batch is fine
    x, w2d, bias, factors, scale = _make_inputs(N, H, W)
    want = _golden_stem(x, w2d, bias, factors, scale)
    got = _simulate_kernel(x, w2d, bias, factors, scale)
    np.testing.assert_array_equal(got, want)


def test_pack_stem_weights_layout():
    w2d = np.arange(64 * 192, dtype=np.int32).reshape(64, 192) % 127
    w2d = w2d.astype(np.int8)
    wle, whe, wlo, who = (np.asarray(m) for m in
                          pack_stem_weights(w2d))
    w4 = w2d.reshape(64, 12, 4, 4)
    for kh in range(4):
        for ch in range(12):
            np.testing.assert_array_equal(
                wle[:, 32 * kh + ch], w4[:, ch, kh, 0])
            np.testing.assert_array_equal(
                wle[:, 32 * kh + 16 + ch], w4[:, ch, kh, 1])
            np.testing.assert_array_equal(
                whe[:, 32 * kh + ch], w4[:, ch, kh, 2])
            np.testing.assert_array_equal(
                who[:, 32 * kh + 16 + ch], w4[:, ch, kh, 3])
    # pad channels are structural zeros
    for m in (wle, whe, wlo, who):
        for kh in range(4):
            np.testing.assert_array_equal(
                m[:, 32 * kh + 12:32 * kh + 16], 0)


def test_stacked_pack_is_block_shift_diagonal():
    """pack_stem_weights_stacked: channels 0-63 carry the taps at
    sublanes 0-127, channels 64-127 the SAME taps shifted one ring
    slot (32 sublanes) — the M=128 stacked-rows operand."""
    from resnet_accel_tpu.ops.stem_fused import pack_stem_weights_stacked
    w2d = (np.arange(64 * 192, dtype=np.int32).reshape(64, 192)
           % 127).astype(np.int8)
    flat = [np.asarray(m) for m in pack_stem_weights(w2d)]
    for m2, m in zip(pack_stem_weights_stacked(w2d), flat):
        m2 = np.asarray(m2)
        assert m2.shape == (128, 160)
        np.testing.assert_array_equal(m2[:64, :128], m)
        np.testing.assert_array_equal(m2[:64, 128:], 0)
        np.testing.assert_array_equal(m2[64:, 32:], m)
        np.testing.assert_array_equal(m2[64:, :32], 0)


@pytest.mark.parametrize("stacked", [False, True])
def test_pallas_kernel_interpret_matches_golden(stacked):
    """The PALLAS KERNEL ITSELF (ring staging, partial mirror, lag-2
    grid, stacked/unstacked dots) under the interpreter == the shipping
    composition — so an on-chip mismatch can only be a Mosaic lowering
    bug, never kernel structure."""
    x, w2d, bias, factors, scale = _make_inputs(128, 16, 16, seed=5)
    want = _golden_stem(x, w2d, bias, factors, scale)
    got = np.asarray(stem_conv_pool_nm(
        jnp.asarray(x), jnp.asarray(w2d), jnp.asarray(bias),
        jnp.asarray(factors), scale, stacked=stacked,
        kernel_interpret=True))
    np.testing.assert_array_equal(got, want)


def test_interpret_fallback_matches_golden():
    x, w2d, bias, factors, scale = _make_inputs(128, 16, 16, seed=3)
    want = _golden_stem(x, w2d, bias, factors, scale)
    got = np.asarray(stem_conv_pool_nm(
        jnp.asarray(x), jnp.asarray(w2d), jnp.asarray(bias),
        jnp.asarray(factors), scale, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_geometry_gate():
    x = jnp.zeros((64, 3, 16, 16), jnp.float32)   # N % 128 != 0
    with pytest.raises(ValueError):
        stem_conv_pool_nm(x, jnp.zeros((64, 192), jnp.int8),
                          jnp.zeros(64, jnp.int32),
                          jnp.ones(64, jnp.float32), 0.05)


def test_quant_mode_inv_matches_golden():
    """The verified pow2-reciprocal staging multiply (quant_mode="inv")
    is bit-identical to the golden divide — same kernel, same
    interpreter, pow2 scale (epilogue.exact_pow2_inv contract)."""
    x, w2d, bias, factors, _ = _make_inputs(128, 16, 16, seed=7)
    scale = 0.03125                     # 2^-5
    want = _golden_stem(x, w2d, bias, factors, scale)
    for qm in ("div", "inv"):
        got = np.asarray(stem_conv_pool_nm(
            jnp.asarray(x), jnp.asarray(w2d), jnp.asarray(bias),
            jnp.asarray(factors), scale, quant_mode=qm,
            kernel_interpret=True))
        np.testing.assert_array_equal(got, want)


def test_quant_mode_gate():
    x = jnp.zeros((128, 3, 16, 16), jnp.float32)
    args = (x, jnp.zeros((64, 192), jnp.int8), jnp.zeros(64, jnp.int32),
            jnp.ones(64, jnp.float32))
    with pytest.raises(ValueError, match="power-of-two"):
        stem_conv_pool_nm(*args, 0.05, quant_mode="inv")
    with pytest.raises(ValueError, match="quant_mode"):
        stem_conv_pool_nm(*args, 0.03125, quant_mode="nonsense")


@pytest.mark.parametrize("H,W", [(16, 16), (16, 24), (32, 16)])
def test_padfree_chwn_kernel_matches_golden(H, W):
    """The pad-free staging schedule (ring 8, no XLA pad copy) and the
    CHWN batch-minor ingest are bit-exact vs the golden composition —
    top halo from zero-initialized slots, bottom phantom row from the
    explicit zeroing step (every read goes through base or mirror
    depending on geometry; both are covered by these shapes)."""
    x, w2d, bias, factors, scale = _make_inputs(128, H, W, seed=11)
    want = _golden_stem(x, w2d, bias, factors, scale)
    xc = jnp.asarray(x.transpose(1, 2, 3, 0))
    for kw, xx in ((dict(padfree=True), jnp.asarray(x)),
                   (dict(padfree=True, input_layout="CHWN"), xc),
                   (dict(input_layout="CHWN"), xc)):
        got = np.asarray(stem_conv_pool_nm(
            xx, jnp.asarray(w2d), jnp.asarray(bias),
            jnp.asarray(factors), scale, kernel_interpret=True, **kw))
        np.testing.assert_array_equal(got, want)


def test_padfree_window_algebra_vs_numpy_sim():
    """The pf schedule writes/reads exactly the rows the padded
    schedule does (same conv/pool output), checked on the numpy
    window-algebra sim at ImageNet geometry."""
    x, w2d, bias, factors, scale = _make_inputs(2, 224, 224, seed=12)
    want = _golden_stem(x, w2d, bias, factors, scale)
    got = _simulate_kernel(x, w2d, bias, factors, scale)
    np.testing.assert_array_equal(got, want)


def test_padfree_stacked_rejected():
    x = jnp.zeros((128, 3, 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="stacked"):
        stem_conv_pool_nm(x, jnp.zeros((64, 192), jnp.int8),
                          jnp.zeros(64, jnp.int32),
                          jnp.ones(64, jnp.float32), 0.05,
                          padfree=True, stacked=True)
