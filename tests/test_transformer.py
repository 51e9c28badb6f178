"""INT8 sparse transformer encoder block tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu.models.transformer import TransformerBlockInt8


@pytest.fixture(scope="module")
def block():
    return TransformerBlockInt8.from_random(
        d_model=128, n_heads=4, d_ff=256, sparsity=0.8, block=8, seed=0)


class TestTransformerBlock:
    def test_sparsity(self, block):
        rep = block.sparsity_report()
        assert set(rep) == {"wq", "wk", "wv", "wo", "w1", "w2"}
        assert all(0.75 < v < 0.85 for v in rep.values()), rep

    def test_jax_matches_golden(self, block):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (16, 128)).astype(np.float32)
        got = np.asarray(block(jnp.asarray(x)))
        exp = block.forward_golden(x)
        np.testing.assert_allclose(got, exp, rtol=2e-3, atol=2e-3)
        assert got.shape == (16, 128)

    def test_causal_mask(self, block):
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (8, 128)).astype(np.float32)
        # With causal masking, output at position 0 must be independent
        # of later positions.
        full = block.forward_golden(x, causal=True)
        x2 = x.copy()
        x2[4:] = rng.normal(0, 1, (4, 128))
        perturbed = block.forward_golden(x2, causal=True)
        np.testing.assert_allclose(full[0], perturbed[0], rtol=1e-5)
        assert not np.allclose(full[7], perturbed[7])

    def test_residual_structure(self, block):
        # Output correlates with input (residual stream preserved).
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (8, 128)).astype(np.float32)
        out = block.forward_golden(x)
        corr = np.corrcoef(x.reshape(-1), out.reshape(-1))[0, 1]
        assert corr > 0.3

    def test_deterministic(self, block):
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (4, 128)).astype(np.float32)
        a = np.asarray(block(jnp.asarray(x)))
        b = np.asarray(block(jnp.asarray(x)))
        np.testing.assert_array_equal(a, b)


class TestFlashPath:
    @pytest.mark.parametrize("causal", [False, True])
    def test_flash_matches_einsum_path(self, block, causal):
        rng = np.random.default_rng(11)
        x = rng.normal(0, 1, (16, 128)).astype(np.float32)
        a = np.asarray(block(jnp.asarray(x), causal=causal))
        b = np.asarray(block(jnp.asarray(x), causal=causal, flash=True))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


class TestKVCacheDecode:
    def test_incremental_matches_full_causal(self, block):
        rng = np.random.default_rng(10)
        T = 8
        x = rng.normal(0, 1, (T, 128)).astype(np.float32)
        scales = block.calibrate_scales(x)

        # Full causal forward with the SAME static scales.
        full = np.asarray(block(jnp.asarray(x), causal=True,
                                scales=scales))

        # Token-by-token decode through the KV cache.
        cache = block.init_cache(max_len=T)
        outs = []
        for t in range(T):
            y, cache = block.decode_step(
                cache, jnp.asarray(x[t:t + 1]), scales)
            outs.append(np.asarray(y))
        inc = np.concatenate(outs, axis=0)
        np.testing.assert_allclose(inc, full, rtol=1e-4, atol=1e-4)

    def test_cache_len_tracks(self, block):
        cache = block.init_cache(max_len=4)
        scales = {k: 0.05 for k in ("h1", "ctx", "h2", "mlp")}
        x = np.zeros((1, 128), np.float32)
        for expect in (1, 2):
            _, cache = block.decode_step(cache, jnp.asarray(x), scales)
            assert int(cache["len"]) == expect
