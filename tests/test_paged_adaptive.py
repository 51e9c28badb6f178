"""Adaptive speculation in the paged engine (spec_adaptive=True).

Round-5 measurement (docs/SERVING.md, docs/paged_spec_bench.json): the
non-speculative engine amortizes `chunk` micro-steps per dispatch, so a
verify window must consume more than `chunk` tokens per dispatch to pay
for itself — which only happens when prompt-lookup acceptance runs
long.  Adaptive mode tracks an EWMA of tokens-consumed-per-verify and
switches to the chunked program when speculation is not paying,
re-probing periodically.  The contract under test: greedy streams are
BIT-IDENTICAL to the per-sequence oracle no matter where the engine
switches modes (both programs emit the model's exact argmax chain).
"""

import numpy as np
import pytest

from resnet_accel_tpu.models.lm import TransformerLMInt8
from resnet_accel_tpu.runtime.paged import PagedKVBatcher

_CACHE = None


def _lm():
    global _CACHE
    if _CACHE is None:
        model = TransformerLMInt8.from_random(
            seed=0, vocab=61, d_model=64, n_heads=4, n_layers=2,
            max_len=96, sparsity=0.5)
        rng = np.random.default_rng(1)
        scales = model.calibrate(rng.integers(0, 61, 24))
        _CACHE = (model, scales)
    return _CACHE


def _oracle(model, scales, prompt, n_new):
    out = model.generate(np.asarray(prompt, np.int32), n_new, scales,
                         jit=True, parallel_prefill=True)
    return [int(t) for t in np.asarray(out)]


class TestValidation:
    def test_requires_spec_draft(self):
        model, scales = _lm()
        with pytest.raises(ValueError, match="spec_draft"):
            PagedKVBatcher(model, scales, spec_adaptive=True)

    def test_greedy_only(self):
        model, scales = _lm()
        with pytest.raises(ValueError, match="greedy"):
            PagedKVBatcher(model, scales, spec_draft=3,
                           spec_adaptive=True, temperature=0.8)

    def test_probe_bounds(self):
        model, scales = _lm()
        with pytest.raises(ValueError, match="spec_probe"):
            PagedKVBatcher(model, scales, spec_draft=3,
                           spec_adaptive=True, spec_probe=0)


class TestStreamExactness:
    """Streams equal the oracle regardless of switching schedule."""

    @pytest.mark.parametrize("kw,expect_switches", [
        # threshold unreachable -> drops to chunked after one probe,
        # tiny reprobe -> flips back and forth for the whole run
        (dict(spec_min_take=999.0, spec_probe=1, spec_reprobe=2),
         "many"),
        # threshold 0 -> EWMA can never drop below it: pure spec
        (dict(spec_min_take=0.0), "none"),
        # one switch then a long chunked cooldown: exercises the
        # spec->chunk handoff (self._prev seeding) mid-decode
        (dict(spec_min_take=999.0, spec_probe=1, spec_reprobe=10_000),
         "one"),
    ])
    def test_vs_oracle(self, kw, expect_switches):
        model, scales = _lm()
        rng = np.random.default_rng(7)
        prompts = [rng.integers(0, 61, n).tolist() for n in (3, 9, 14)]
        want = [_oracle(model, scales, p, 12) for p in prompts]
        eng = PagedKVBatcher(model, scales, slots=2, page=8,
                             pool_pages=24, chunk=3, spec_draft=3,
                             spec_adaptive=True, **kw)
        rids = [eng.submit(p, 12) for p in prompts]
        res = eng.run()
        assert [res[r] for r in rids] == want
        if expect_switches == "none":
            assert eng.spec_switches == 0
        elif expect_switches == "one":
            assert eng.spec_switches == 1
        else:
            assert eng.spec_switches > 1

    def test_switch_during_prefill(self):
        """A switch landing while a long prompt is still being ingested
        must hand over fed/prev state correctly."""
        model, scales = _lm()
        rng = np.random.default_rng(3)
        prompt = rng.integers(0, 61, 40).tolist()
        want = _oracle(model, scales, prompt, 8)
        eng = PagedKVBatcher(model, scales, slots=1, page=8,
                             pool_pages=16, chunk=2, spec_draft=4,
                             spec_adaptive=True, spec_min_take=999.0,
                             spec_probe=1, spec_reprobe=3)
        rid = eng.submit(prompt, 8)
        res = eng.run()
        assert res[rid] == want
        assert eng.spec_switches > 1

    def test_eos_and_slot_reuse_across_modes(self):
        """EOS retirement + slot reuse while the engine is flipping
        modes: later admissions must start clean in either program."""
        model, scales = _lm()
        rng = np.random.default_rng(11)
        prompts = [rng.integers(0, 61, 6).tolist() for _ in range(5)]
        want = []
        for p in prompts:
            full = _oracle(model, scales, p, 10)
            if 7 in full:
                full = full[:full.index(7) + 1]
            want.append(full)
        eng = PagedKVBatcher(model, scales, slots=2, page=8,
                             pool_pages=20, chunk=3, spec_draft=3,
                             spec_adaptive=True, spec_min_take=999.0,
                             spec_probe=1, spec_reprobe=2)
        rids = [eng.submit(p, 10, eos=7) for p in prompts]
        res = eng.run()
        assert [res[r] for r in rids] == want

    def test_int8_kv_matches_canonical(self):
        """int8 KV adaptive == canonical single-slot int8 engine:
        per-token quantization depends only on the token's own K/V
        rows, so mode switches cannot move the stream."""
        model, scales = _lm()
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, 61, 8).tolist() for _ in range(3)]

        def run(**kw):
            eng = PagedKVBatcher(model, scales, page=8, pool_pages=24,
                                 kv_dtype="int8", **kw)
            rids = [eng.submit(p, 10) for p in prompts]
            res = eng.run()
            return [res[r] for r in rids]

        want = run(slots=1, chunk=1, reserve="full", spec_draft=0)
        got = run(slots=2, chunk=3, spec_draft=3, spec_adaptive=True,
                  spec_min_take=999.0, spec_probe=1, spec_reprobe=2)
        assert got == want


class TestPolicy:
    def test_ewma_gates_switch(self):
        """The engine stays speculative until spec_probe samples have
        been collected, then leaves when the EWMA is below threshold."""
        model, scales = _lm()
        eng = PagedKVBatcher(model, scales, slots=1, page=8,
                             pool_pages=16, chunk=3, spec_draft=3,
                             spec_adaptive=True, spec_min_take=999.0,
                             spec_probe=4, spec_reprobe=10_000)
        rid = eng.submit([1, 2, 3], 16)
        flips = []
        while eng.step_engine():
            flips.append(eng._spec_mode)
        assert rid in eng.results() or True  # drained
        # first spec_probe iterations speculative, then chunked
        assert flips[:3] == [True, True, True]
        assert not any(flips[4:])
