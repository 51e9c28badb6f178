"""Continuous-batching serving engine vs per-sequence generate.

Greedy outputs must be identical to TransformerLMInt8.generate for
every request, regardless of how requests interleave across slots —
including queueing behind a full pool and slot reuse after drain.
"""

import numpy as np
import pytest

from resnet_accel_tpu.models.lm import TransformerLMInt8
from resnet_accel_tpu.runtime.serving import ContinuousBatcher


@pytest.fixture(scope="module")
def lm():
    model = TransformerLMInt8.from_random(
        seed=0, vocab=61, d_model=64, n_heads=4, n_layers=2,
        max_len=48, sparsity=0.5)
    rng = np.random.default_rng(1)
    scales = model.calibrate(rng.integers(0, 61, 24))
    return model, scales


def _expected(model, scales, prompt, n_new):
    out = model.generate(np.asarray(prompt, np.int32), n_new, scales,
                         jit=True, parallel_prefill=True)
    return [int(t) for t in np.asarray(out)]


def test_single_request_matches_generate(lm):
    model, scales = lm
    b = ContinuousBatcher(model, scales, slots=2)
    rid = b.submit([5, 9, 2, 44], n_new=6)
    res = b.run()
    assert res[rid] == _expected(model, scales, [5, 9, 2, 44], 6)


def test_interleaved_requests_match_independent_generate(lm):
    model, scales = lm
    rng = np.random.default_rng(3)
    b = ContinuousBatcher(model, scales, slots=2)
    reqs = []
    for n in range(5):  # 5 requests through 2 slots: queueing + reuse
        prompt = rng.integers(0, 61, rng.integers(2, 9)).tolist()
        n_new = int(rng.integers(3, 8))
        reqs.append((b.submit(prompt, n_new), prompt, n_new))
    res = b.run()
    for rid, prompt, n_new in reqs:
        assert res[rid] == _expected(model, scales, prompt, n_new), rid


def test_mid_stream_admission(lm):
    """A request submitted while others are decoding joins a free slot
    without perturbing them."""
    model, scales = lm
    b = ContinuousBatcher(model, scales, slots=2)
    r1 = b.submit([7, 7, 7], n_new=10)
    # advance a few engine steps, then admit a second request
    for _ in range(4):
        b.step_engine()
    r2 = b.submit([1, 2, 3, 4], n_new=4)
    res = b.run()
    assert res[r1] == _expected(model, scales, [7, 7, 7], 10)
    assert res[r2] == _expected(model, scales, [1, 2, 3, 4], 4)


def test_step_accounting_and_validation(lm):
    model, scales = lm
    b = ContinuousBatcher(model, scales, slots=2)
    with pytest.raises(ValueError, match="exceeds"):
        b.submit(list(range(40)), n_new=20)
    with pytest.raises(ValueError, match="empty"):
        b.submit([], 3)
    rid = b.submit([3, 1], n_new=2)
    res = b.run()
    # 2 prompt tokens + 1 extra decode = 3 engine steps for one request
    assert b.steps == 3
    assert len(res[rid]) == 2
    assert b.results() == {}  # run() drains collected results
    with pytest.raises(ValueError, match="top_k"):
        ContinuousBatcher(model, scales, slots=1, top_k=0,
                          temperature=0.5)
    with pytest.raises(ValueError, match="position table"):
        ContinuousBatcher(model, scales, slots=1,
                          max_len=model.max_len + 8)

@pytest.mark.parametrize("chunk", [2, 4, 7])
def test_chunked_equals_unchunked(lm, chunk):
    """chunk>1 scans k micro-steps per dispatch; results identical."""
    model, scales = lm
    rng = np.random.default_rng(10 + chunk)
    b = ContinuousBatcher(model, scales, slots=2, chunk=chunk)
    reqs = []
    for _ in range(4):
        prompt = rng.integers(0, 61, rng.integers(2, 9)).tolist()
        n_new = int(rng.integers(3, 8))
        reqs.append((b.submit(prompt, n_new), prompt, n_new))
    res = b.run()
    for rid, prompt, n_new in reqs:
        assert res[rid] == _expected(model, scales, prompt, n_new), rid
    # chunking must reduce dispatches below the micro-step count
    assert b.steps < b.micro_steps


class TestSampledServing:
    def test_sampled_matches_per_sequence_sample(self, lm):
        """Per-slot sampling streams must equal model.sample exactly:
        one key split per consumed token, chained from PRNGKey(seed)."""
        import jax
        model, scales = lm
        rng = np.random.default_rng(21)
        b = ContinuousBatcher(model, scales, slots=2, chunk=3,
                              temperature=0.9, top_k=7)
        reqs = []
        for seed in range(5):
            prompt = rng.integers(0, 61, rng.integers(2, 9)).tolist()
            n_new = int(rng.integers(3, 8))
            reqs.append((b.submit(prompt, n_new, seed=seed),
                         prompt, n_new, seed))
        res = b.run()
        for rid, prompt, n_new, seed in reqs:
            exp = model.sample(
                np.asarray(prompt, np.int32), n_new, scales,
                jax.random.PRNGKey(seed), temperature=0.9, top_k=7,
                jit=False)
            assert res[rid] == [int(t) for t in np.asarray(exp)], rid

    def test_greedy_mode_unchanged_by_seed(self, lm):
        model, scales = lm
        b = ContinuousBatcher(model, scales, slots=2, chunk=2)
        r1 = b.submit([4, 5, 6], 5, seed=1)
        r2 = b.submit([4, 5, 6], 5, seed=99)
        res = b.run()
        assert res[r1] == res[r2] == _expected(model, scales,
                                               [4, 5, 6], 5)


def test_eos_early_stop(lm):
    model, scales = lm
    full = _expected(model, scales, [9, 4, 1], 10)
    # pick a token the greedy stream actually emits (not the last)
    eos = full[2]
    want = full[:full.index(eos) + 1]
    b = ContinuousBatcher(model, scales, slots=1, chunk=4)
    rid = b.submit([9, 4, 1], 10, eos=eos)
    res = b.run()
    assert res[rid] == want
    # without eos the same request runs to budget
    b2 = ContinuousBatcher(model, scales, slots=1, chunk=4)
    assert b2.run() == {}  # empty engine no-ops
    rid2 = b2.submit([9, 4, 1], 10)
    assert b2.run()[rid2] == full
