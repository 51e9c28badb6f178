"""Decoder LM: cached decode vs full causal forward, jitted generate.

The invariant under test is the serving contract: with the same static
calibrated activation scales, the incremental KV-cache path and the
teacher-forced full-sequence path produce identical logits (the block
level version of this is exact; stacking and the tied head only add
fp32 LN/matmul on top).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_accel_tpu.models.lm import TransformerLMInt8, \
    sinusoidal_positions


@pytest.fixture(scope="module")
def lm():
    return TransformerLMInt8.from_random(
        vocab=32, d_model=64, n_heads=4, d_ff=128, n_layers=2,
        max_len=16, sparsity=0.7, block=8, seed=3)


@pytest.fixture(scope="module")
def toks():
    return np.random.default_rng(7).integers(0, 32, 10).astype(np.int32)


@pytest.fixture(scope="module")
def scales(lm, toks):
    return lm.calibrate(toks)


class TestPositions:
    def test_sinusoidal_shape_and_range(self):
        pe = sinusoidal_positions(16, 64)
        assert pe.shape == (16, 64)
        assert np.abs(pe).max() <= 1.0
        assert pe[0, 0] == 0.0 and pe[0, 1] == 1.0


class TestTeacherForcedEquivalence:
    def test_decode_matches_full_forward(self, lm, toks, scales):
        full = np.asarray(lm.forward(jnp.asarray(toks), scales))
        caches = lm.init_caches()
        inc = []
        for t in toks:
            logits, caches = lm.decode_step(
                caches, jnp.int32(t), scales)
            inc.append(np.asarray(logits))
        inc = np.stack(inc)
        np.testing.assert_allclose(inc, full, rtol=1e-4, atol=1e-4)

    def test_flash_prefill_matches_einsum(self, lm, toks, scales):
        a = np.asarray(lm.forward(jnp.asarray(toks), scales))
        b = np.asarray(lm.forward(jnp.asarray(toks), scales, flash=True))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_golden_close_to_jax_dynamic(self, lm, toks):
        g = lm.forward_golden(toks)
        j = np.asarray(lm.forward(jnp.asarray(toks)))
        np.testing.assert_allclose(j, g, rtol=2e-3, atol=2e-3)


class TestBatchedServing:
    def test_vmap_forward_matches_loop(self, lm, scales):
        rng = np.random.default_rng(8)
        batch = rng.integers(0, 32, (3, 10)).astype(np.int32)
        f = jax.jit(jax.vmap(lambda t: lm.forward(t, scales)))
        out = np.asarray(f(jnp.asarray(batch)))
        for i in range(3):
            ref = np.asarray(lm.forward(jnp.asarray(batch[i]), scales))
            np.testing.assert_allclose(out[i], ref, rtol=1e-5,
                                       atol=1e-5)


class TestGenerate:
    def test_greedy_matches_teacher_forced_loop(self, lm, toks, scales):
        prompt = toks[:4]
        n_new = 5
        got = np.asarray(lm.generate(jnp.asarray(prompt), n_new, scales))

        # Reference: grow the sequence with full forwards each step.
        seq = list(prompt)
        want = []
        for _ in range(n_new):
            logits = np.asarray(
                lm.forward(jnp.asarray(np.array(seq, np.int32)), scales))
            nxt = int(np.argmax(logits[-1]))
            want.append(nxt)
            seq.append(nxt)
        assert got.tolist() == want

    def test_parallel_prefill_matches_scan_prefill(self, lm, toks,
                                                   scales):
        prompt = jnp.asarray(toks[:5])
        a = np.asarray(lm.generate(prompt, 4, scales,
                                   parallel_prefill=True))
        b = np.asarray(lm.generate(prompt, 4, scales,
                                   parallel_prefill=False))
        np.testing.assert_array_equal(a, b)

    def test_flash_prefill_generate(self, lm, toks, scales):
        prompt = jnp.asarray(toks[:5])
        a = np.asarray(lm.generate(prompt, 4, scales, flash=True))
        b = np.asarray(lm.generate(prompt, 4, scales, flash=False))
        np.testing.assert_array_equal(a, b)

    def test_generate_is_jittable_scan(self, lm, toks, scales):
        # Same program twice -> identical tokens (determinism) and the
        # jitted path agrees with the eager path.
        prompt = jnp.asarray(toks[:3])
        a = np.asarray(lm.generate(prompt, 4, scales, jit=True))
        b = np.asarray(lm.generate(prompt, 4, scales, jit=False))
        np.testing.assert_array_equal(a, b)

    def test_batched_generate_matches_per_sequence(self, lm, toks,
                                                   scales):
        prompts = np.stack([toks[:4], toks[2:6], toks[1:5]])
        outs = np.asarray(lm.generate(jnp.asarray(prompts), 3, scales,
                                      batched=True))
        assert outs.shape == (3, 3)
        for i in range(3):
            ref = np.asarray(lm.generate(jnp.asarray(prompts[i]), 3,
                                         scales))
            np.testing.assert_array_equal(outs[i], ref)

    def test_generate_rejects_overlong(self, lm, scales):
        with pytest.raises(ValueError, match="exceeds"):
            lm.generate(jnp.zeros(14, jnp.int32), 5, scales)

    def test_respects_max_len(self, lm, scales):
        # prompt + generated must fit the position table.
        prompt = jnp.zeros(2, jnp.int32)
        out = lm.generate(prompt, 3, scales)
        assert out.shape == (3,)
        assert int(out.max()) < lm.vocab


class TestSampling:
    def _lm(self):
        import numpy as np

        from resnet_accel_tpu.models.lm import TransformerLMInt8
        model = TransformerLMInt8.from_random(
            seed=2, vocab=37, d_model=32, n_heads=2, n_layers=2,
            max_len=40, sparsity=0.5)
        rng = np.random.default_rng(5)
        scales = model.calibrate(rng.integers(0, 37, 20))
        return model, scales, rng

    def test_temperature_zero_equals_greedy(self):
        import jax
        import numpy as np
        model, scales, rng = self._lm()
        prompt = np.asarray(rng.integers(0, 37, 6), np.int32)
        g = np.asarray(model.generate(prompt, 8, scales, jit=False))
        s = np.asarray(model.sample(prompt, 8, scales,
                                    jax.random.PRNGKey(0),
                                    temperature=0.0, jit=False))
        np.testing.assert_array_equal(g, s)

    def test_deterministic_per_key_and_key_sensitivity(self):
        import jax
        import numpy as np
        model, scales, rng = self._lm()
        prompt = np.asarray(rng.integers(0, 37, 6), np.int32)
        a = np.asarray(model.sample(prompt, 12, scales,
                                    jax.random.PRNGKey(7),
                                    temperature=1.0, jit=False))
        b = np.asarray(model.sample(prompt, 12, scales,
                                    jax.random.PRNGKey(7),
                                    temperature=1.0, jit=False))
        c = np.asarray(model.sample(prompt, 12, scales,
                                    jax.random.PRNGKey(8),
                                    temperature=1.0, jit=False))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_top_k_restricts_support(self):
        """With top_k=1 sampling collapses to greedy regardless of
        temperature."""
        import jax
        import numpy as np
        model, scales, rng = self._lm()
        prompt = np.asarray(rng.integers(0, 37, 5), np.int32)
        g = np.asarray(model.generate(prompt, 10, scales, jit=False))
        s = np.asarray(model.sample(prompt, 10, scales,
                                    jax.random.PRNGKey(3),
                                    temperature=2.5, top_k=1, jit=False))
        np.testing.assert_array_equal(g, s)

    def test_length_guard(self):
        import jax
        import numpy as np
        import pytest
        model, scales, rng = self._lm()
        prompt = np.asarray(rng.integers(0, 37, 30), np.int32)
        with pytest.raises(ValueError, match="exceeds"):
            model.sample(prompt, 20, scales, jax.random.PRNGKey(0))


class TestSpeculativeDecoding:
    """Prompt-lookup speculative decoding: greedy outputs bit-identical
    to generate(), fewer verify passes on repetitive text."""

    @pytest.fixture(scope="class")
    def big(self):
        model = TransformerLMInt8.from_random(
            vocab=32, d_model=64, n_heads=4, d_ff=128, n_layers=2,
            max_len=96, sparsity=0.7, block=8, seed=3)
        scales = model.calibrate(
            np.random.default_rng(7).integers(0, 32, 24))
        return model, scales

    def test_verify_step_matches_decode_steps(self, big):
        model, scales = big
        import jax.numpy as jnp
        prompt = np.random.default_rng(0).integers(0, 32, 6)
        caches_a = model.init_caches()
        caches_b = model.init_caches()
        feed = np.random.default_rng(1).integers(0, 32, 5)
        # token-by-token
        outs_a = []
        for t in np.concatenate([prompt, feed]):
            la, caches_a = model.decode_step(caches_a,
                                             jnp.int32(int(t)), scales)
            outs_a.append(np.asarray(la))
        # prompt token-by-token, then one multi-token verify
        for t in prompt:
            _, caches_b = model.decode_step(caches_b,
                                            jnp.int32(int(t)), scales)
        lb, caches_b = model.verify_step(
            caches_b, jnp.asarray(feed, jnp.int32), scales)
        np.testing.assert_allclose(np.asarray(lb),
                                   np.stack(outs_a[len(prompt):]),
                                   rtol=0, atol=1e-4)
        assert int(caches_b[0]["len"]) == len(prompt) + len(feed)

    @pytest.mark.parametrize("draft,ngram", [(7, 3), (3, 2), (0, 1)])
    def test_identical_to_generate(self, big, draft, ngram):
        model, scales = big
        rng = np.random.default_rng(5)
        cases = [([4, 9, 2, 4, 9, 2, 4, 9, 2, 7], 24),
                 (rng.integers(0, 32, 12).tolist(), 16),
                 ([3], 8)]
        for prompt, n_new in cases:
            exp = np.asarray(model.generate(
                np.asarray(prompt, np.int32), n_new, scales))
            got = np.asarray(model.generate_speculative(
                np.asarray(prompt, np.int32), n_new, scales,
                draft=draft, ngram=ngram))
            np.testing.assert_array_equal(got, exp)

    def test_acceptance_reduces_verify_passes(self, big):
        model, scales = big
        prompt = ([1, 2, 3, 4, 5] * 4)[:18]     # periodic: lookup hits
        n_new = 30
        toks, steps = model.generate_speculative(
            np.asarray(prompt, np.int32), n_new, scales, draft=7,
            return_stats=True)
        assert int(steps) < n_new               # beat one-pass-per-token
        exp = np.asarray(model.generate(np.asarray(prompt, np.int32),
                                        n_new, scales))
        np.testing.assert_array_equal(np.asarray(toks), exp)

    def test_rejects_overlong(self, big):
        model, scales = big
        with pytest.raises(ValueError, match="draft"):
            model.generate_speculative(
                np.arange(40, dtype=np.int32) % 32, 52, scales, draft=7)
