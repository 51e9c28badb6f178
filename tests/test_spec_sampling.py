"""Speculative SAMPLING: rejection-sampled drafts preserve the target
distribution exactly.

The math under test (models/lm.spec_accept_sampled): with a
deterministic prompt-lookup draft (point-mass proposal), accepting
draft d with probability p(d) and sampling the first rejection from
softmax(z with z[d] = -inf) makes every emitted token distributed
exactly as sequential ancestral sampling from the target — the
standard speculative-sampling guarantee (Leviathan et al. /
Chen et al. 2023, reproduced here from the definition, not copied).

Reference parity note: the reference has no LM serving at all (its
transformer artifact is a weight fixture, /root/reference/sw/exporters/
export_transformer.py:63-112); this extends the beyond-parity serving
stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_accel_tpu.models.lm import (TransformerLMInt8,
                                        adjust_logits,
                                        spec_accept_sampled)


class TestSpecAcceptMath:
    """Monte Carlo validation of the accept/emit step against the
    exact sequential-sampling distribution."""

    S, V, N = 4, 8, 60000

    @pytest.fixture(scope="class")
    def mc(self):
        rng = np.random.default_rng(11)
        z = jnp.asarray(rng.normal(0, 1.5, (self.S, self.V)),
                        jnp.float32)
        fed = jnp.asarray(rng.integers(0, self.V, self.S), jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(0), self.N)
        run = jax.jit(jax.vmap(
            lambda k: spec_accept_sampled(z, fed, k)[:2]))
        n_acc, emit = run(keys)
        return (np.asarray(z), np.asarray(fed), np.asarray(n_acc),
                np.asarray(emit))

    def test_first_emitted_token_marginal_is_target(self, mc):
        z, fed, n_acc, emit = mc
        # emit[0] is either the accepted draft or the residual draw;
        # the two branches must reassemble softmax(z[0]) exactly
        p0 = np.exp(z[0] - z[0].max())
        p0 /= p0.sum()
        counts = np.bincount(emit[:, 0], minlength=self.V) / self.N
        # 4-sigma binomial tolerance per atom
        tol = 4 * np.sqrt(p0 * (1 - p0) / self.N) + 1e-4
        assert np.all(np.abs(counts - p0) < tol), (counts, p0)

    def test_second_token_conditional_is_target(self, mc):
        z, fed, n_acc, emit = mc
        # conditioned on the first draft being accepted, emit[1] must
        # follow softmax(z[1]) (the residual branch can never produce
        # the draft token, so emit[0] == fed[1] iff accepted)
        sel = emit[:, 0] == fed[1]
        assert sel.sum() > 3000          # the fixture accepts often
        p1 = np.exp(z[1] - z[1].max())
        p1 /= p1.sum()
        counts = np.bincount(emit[sel, 1], minlength=self.V) / sel.sum()
        tol = 4 * np.sqrt(p1 * (1 - p1) / sel.sum()) + 1e-4
        assert np.all(np.abs(counts - p1) < tol), (counts, p1)

    def test_acceptance_rate_matches_p_draft(self, mc):
        z, fed, n_acc, emit = mc
        p0 = np.exp(z[0] - z[0].max())
        p0 /= p0.sum()
        rate = (n_acc >= 1).mean()
        exp = p0[fed[1]]
        assert abs(rate - exp) < 4 * np.sqrt(exp * (1 - exp) / self.N)

    def test_rejection_never_emits_the_draft(self, mc):
        z, fed, n_acc, emit = mc
        rej = emit[:, 0] != fed[1]       # first draft rejected
        assert rej.any()
        # those runs stopped at position 0: nothing accepted
        assert (n_acc[rej] == 0).all()

    def test_emit_prefix_is_the_draft_chain(self, mc):
        z, fed, n_acc, emit = mc
        for i in range(self.S - 1):
            sel = n_acc > i
            if sel.any():
                assert (emit[sel, i] == fed[i + 1]).all()

    def test_certain_draft_always_accepted(self):
        # a draft the target puts ~all mass on must survive every key
        z = jnp.full((2, self.V), -30.0, jnp.float32)
        z = z.at[0, 3].set(0.0).at[1, 5].set(0.0)
        fed = jnp.asarray([0, 3], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(1), 256)
        n_acc, emit = jax.vmap(
            lambda k: spec_accept_sampled(z, fed, k)[:2])(keys)
        assert (np.asarray(n_acc) == 1).all()
        assert (np.asarray(emit)[:, 0] == 3).all()
        assert (np.asarray(emit)[:, 1] == 5).all()   # bonus ~ row 1

    def test_adjust_logits_matches_sampled_token_semantics(self):
        logits = jnp.asarray(
            np.random.default_rng(2).normal(0, 2, (self.V,)),
            jnp.float32)
        z = adjust_logits(logits, 0.7, top_k=3)
        kept = np.isfinite(np.asarray(z))
        assert kept.sum() == 3
        top3 = set(np.argsort(np.asarray(logits))[-3:].tolist())
        assert set(np.nonzero(kept)[0].tolist()) == top3
        np.testing.assert_allclose(
            np.asarray(z)[kept],
            np.asarray(logits)[kept] / np.float32(0.7), rtol=1e-6)


class TestSampledSpeculativeDecode:
    """End-to-end: generate_speculative(temperature>0) on a real tiny
    INT8 sparse LM."""

    @pytest.fixture(scope="class")
    def big(self):
        model = TransformerLMInt8.from_random(
            vocab=32, d_model=64, n_heads=4, d_ff=128, n_layers=2,
            max_len=96, sparsity=0.7, block=8, seed=3)
        scales = model.calibrate(
            np.random.default_rng(7).integers(0, 32, 24))
        return model, scales

    def test_deterministic_per_key_and_key_sensitive(self, big):
        model, scales = big
        prompt = np.asarray([4, 9, 2, 4, 9, 2, 4, 9, 2, 7], np.int32)
        # the tiny random model's logits are sharply peaked, so a high
        # temperature is needed to make the draws actually stochastic
        a = np.asarray(model.generate_speculative(
            prompt, 20, scales, draft=7, temperature=6.0,
            rng_key=jax.random.PRNGKey(0)))
        b = np.asarray(model.generate_speculative(
            prompt, 20, scales, draft=7, temperature=6.0,
            rng_key=jax.random.PRNGKey(0)))
        c = np.asarray(model.generate_speculative(
            prompt, 20, scales, draft=7, temperature=6.0,
            rng_key=jax.random.PRNGKey(1)))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (20,)
        assert not np.array_equal(a, c)     # 20 draws at temp 6.0
        assert ((a >= 0) & (a < 32)).all()
        assert ((c >= 0) & (c < 32)).all()

    def test_first_token_matches_sample_exactly(self, big):
        # token 0 comes from the prefill logits through the SAME
        # sampled_token call sample() makes — identical per key
        model, scales = big
        prompt = np.asarray([4, 9, 2, 4, 9, 2, 4, 9, 2, 7], np.int32)
        for seed in range(6):
            k = jax.random.PRNGKey(seed)
            s = np.asarray(model.sample(prompt, 4, scales, k,
                                        temperature=0.9))
            g = np.asarray(model.generate_speculative(
                prompt, 4, scales, draft=5, temperature=0.9,
                rng_key=k))
            assert s[0] == g[0]

    def test_top1_sampling_equals_greedy(self, big):
        # top_k=1 collapses the target to a point mass on the argmax:
        # sampled speculation must reproduce greedy generate exactly
        model, scales = big
        prompt = np.asarray([4, 9, 2, 4, 9, 2, 4, 9, 2, 7], np.int32)
        exp = np.asarray(model.generate(prompt, 24, scales))
        got = np.asarray(model.generate_speculative(
            prompt, 24, scales, draft=7, temperature=1.0, top_k=1,
            rng_key=jax.random.PRNGKey(3)))
        np.testing.assert_array_equal(got, exp)

    def test_budget_clamp_and_stats(self, big):
        model, scales = big
        prompt = np.asarray(([1, 2, 3, 4, 5] * 4)[:18], np.int32)
        toks, steps = model.generate_speculative(
            prompt, 7, scales, draft=15, temperature=0.8,
            rng_key=jax.random.PRNGKey(2), return_stats=True)
        assert np.asarray(toks).shape == (7,)
        assert int(steps) >= 1

    def test_requires_key_when_sampling(self, big):
        model, scales = big
        with pytest.raises(ValueError, match="rng_key"):
            model.generate_speculative(
                np.asarray([1, 2, 3], np.int32), 4, scales,
                temperature=1.0)

    def test_greedy_default_unchanged(self, big):
        model, scales = big
        prompt = np.asarray([4, 9, 2, 4, 9, 2, 4, 9, 2, 7], np.int32)
        exp = np.asarray(model.generate(prompt, 16, scales))
        got = np.asarray(model.generate_speculative(
            prompt, 16, scales, draft=7))
        np.testing.assert_array_equal(got, exp)
