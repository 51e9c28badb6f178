"""Flash attention kernel vs the materialized-softmax reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resnet_accel_tpu.ops.flash_attention import flash_attention


def reference(q, k, v, causal, scale=None):
    H, T, dh = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(dh)
    s = np.einsum("htd,hsd->hts", q, k).astype(np.float64) * scale
    if causal:
        mask = np.tril(np.ones((T, T), bool))
        s = np.where(mask[None], s, -np.inf)
    e = np.exp(s - s.max(axis=-1, keepdims=True))
    a = e / e.sum(axis=-1, keepdims=True)
    return np.einsum("hts,hsd->htd", a, v).astype(np.float32)


def rand_qkv(rng, h, t, dh):
    q = rng.normal(0, 1, (h, t, dh)).astype(np.float32)
    k = rng.normal(0, 1, (h, t, dh)).astype(np.float32)
    v = rng.normal(0, 1, (h, t, dh)).astype(np.float32)
    return q, k, v


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("t", [128, 256])
    def test_matches_reference(self, causal, t):
        rng = np.random.default_rng(0)
        q, k, v = rand_qkv(rng, 2, t, 128)
        out = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            causal=causal))
        ref = reference(q, k, v, causal)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("t", [100, 130])
    def test_ragged_t_padding(self, t):
        rng = np.random.default_rng(1)
        q, k, v = rand_qkv(rng, 1, t, 64)
        out = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
        ref = reference(q, k, v, True)
        assert out.shape == (1, t, 64)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_multi_kblock_online_softmax(self):
        # T larger than block_k forces the m/l carry across k steps.
        rng = np.random.default_rng(2)
        q, k, v = rand_qkv(rng, 1, 512, 64)
        out = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=128, block_k=128))
        ref = reference(q, k, v, False)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_custom_scale(self):
        rng = np.random.default_rng(3)
        q, k, v = rand_qkv(rng, 1, 128, 64)
        out = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=0.5))
        ref = reference(q, k, v, False, scale=0.5)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_jit_compatible(self):
        rng = np.random.default_rng(4)
        q, k, v = rand_qkv(rng, 2, 128, 64)
        f = jax.jit(lambda a, b, c: flash_attention(a, b, c, causal=True))
        out = np.asarray(f(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(v)))
        ref = reference(q, k, v, True)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_shape_mismatch_raises(self):
        q = jnp.zeros((1, 8, 16))
        with pytest.raises(ValueError):
            flash_attention(q, jnp.zeros((1, 9, 16)), q)
