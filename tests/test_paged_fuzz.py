"""Randomized differential fuzz of the paged-KV engine (hypothesis).

The engine is the repo's most state-heavy code (pages, refcounted
prefix cache, preemption-by-recompute, speculative windows, int8 KV);
its directed tests each pin one feature.  This fuzz drives RANDOM
schedules — admission order, prompt/budget sizes, seeds, EOS, two-wave
mid-flight submission, pool pressure — across RANDOM feature
combinations (reserve x prefix_cache x kv_dtype x spec_draft x
temperature) and asserts the engine's one global contract:

- fp32 KV: every request's stream equals the per-sequence oracle
  ``generate`` (greedy) / ``sample`` (per-request PRNG seed), truncated
  at the first EOS inclusive — token for token, no matter how the
  scheduler interleaved, queued, grew or preempted it.
- int8 KV (documented-divergence knob): streams must be IDENTICAL to a
  canonical single-slot, ample-pool int8 engine — per-token KV
  quantization depends only on the token's own K/V rows, so results
  are invariant to slots/chunk/pool pressure/prefix sharing/spec
  windows even though they diverge from the fp32 oracle.

``spec_draft > 0`` forces greedy (the speculative sampled path is
distribution-exact, not stream-exact — tested separately in
test_paged_spec.py).
"""

import jax
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from resnet_accel_tpu.models.lm import TransformerLMInt8
from resnet_accel_tpu.runtime.paged import PagedKVBatcher

_MODEL = None


def _lm():
    global _MODEL
    if _MODEL is None:
        model = TransformerLMInt8.from_random(
            seed=0, vocab=61, d_model=64, n_heads=4, n_layers=2,
            max_len=48, sparsity=0.5)
        rng = np.random.default_rng(1)
        scales = model.calibrate(rng.integers(0, 61, 24))
        _MODEL = (model, scales)
    return _MODEL


def _truncate_eos(stream, eos):
    if eos is None or eos not in stream:
        return stream
    return stream[:stream.index(eos) + 1]


def _oracle_fp32(model, scales, prompt, n_new, seed, eos, temperature,
                 top_k):
    if temperature <= 0:
        out = model.generate(np.asarray(prompt, np.int32), n_new,
                             scales, jit=True, parallel_prefill=True)
    else:
        out = model.sample(np.asarray(prompt, np.int32), n_new, scales,
                           jax.random.PRNGKey(seed),
                           temperature=temperature, top_k=top_k)
    return _truncate_eos([int(t) for t in np.asarray(out)], eos)


@st.composite
def scenario(draw):
    page = draw(st.sampled_from([4, 8]))
    slots = draw(st.integers(1, 3))
    chunk = draw(st.sampled_from([3, 8]))
    reserve = draw(st.sampled_from(["full", "ondemand"]))
    prefix_cache = draw(st.booleans())
    kv_dtype = draw(st.sampled_from(["fp32", "fp32", "int8"]))
    spec_draft = draw(st.sampled_from([0, 0, 3]))
    temperature = 0.0 if spec_draft else draw(
        st.sampled_from([0.0, 0.8]))
    # adaptive speculation: random thresholds/cadence so runs flip
    # between the spec and chunked programs mid-schedule
    spec_adaptive = bool(spec_draft) and draw(st.booleans())
    spec_kw = {}
    if spec_adaptive:
        spec_kw = dict(spec_adaptive=True,
                       spec_min_take=draw(st.sampled_from([0.0, 999.0])),
                       spec_probe=draw(st.integers(1, 2)),
                       spec_reprobe=draw(st.integers(1, 3)))
    reqs = []
    for _ in range(draw(st.integers(2, 4))):
        plen = draw(st.integers(1, 8))
        prompt = [draw(st.integers(0, 60)) for _ in range(plen)]
        n_new = draw(st.integers(2, 6))
        seed = draw(st.integers(0, 9))
        eos = draw(st.sampled_from([None, None, 7]))
        reqs.append((prompt, n_new, seed, eos))
    overhang = spec_draft
    max_need = max(-(-(len(p) + n + overhang) // page)
                   for p, n, _, _ in reqs)
    tight = draw(st.booleans())
    pool = max_need + 1 + (0 if tight else draw(st.integers(2, 6)))
    wave_split = draw(st.integers(0, len(reqs)))
    mid_steps = draw(st.integers(1, 3))
    return dict(page=page, slots=slots, chunk=chunk, reserve=reserve,
                prefix_cache=prefix_cache, kv_dtype=kv_dtype,
                spec_draft=spec_draft, temperature=temperature,
                spec_kw=spec_kw, reqs=reqs, pool=pool,
                wave_split=wave_split, mid_steps=mid_steps)


def _run_engine(model, scales, sc, **overrides):
    kw = dict(slots=sc["slots"], page=sc["page"],
              pool_pages=sc["pool"], chunk=sc["chunk"],
              reserve=sc["reserve"], prefix_cache=sc["prefix_cache"],
              kv_dtype=sc["kv_dtype"], spec_draft=sc["spec_draft"],
              temperature=sc["temperature"],
              top_k=12 if sc["temperature"] > 0 else None,
              **sc["spec_kw"])
    if "spec_draft" in overrides and not overrides["spec_draft"]:
        overrides.setdefault("spec_adaptive", False)
    kw.update(overrides)
    eng = PagedKVBatcher(model, scales, **kw)
    rids = []
    wave1 = sc["reqs"][:sc["wave_split"]]
    wave2 = sc["reqs"][sc["wave_split"]:]
    for p, n, s, e in wave1:
        rids.append(eng.submit(p, n, seed=s, eos=e))
    for _ in range(sc["mid_steps"]):
        if not eng.step_engine():
            break
    for p, n, s, e in wave2:
        rids.append(eng.submit(p, n, seed=s, eos=e))
    res = eng.run()
    return [res[r] for r in rids]


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(sc=scenario())
def test_random_schedules_match_oracle(sc):
    model, scales = _lm()
    got = _run_engine(model, scales, sc)
    if sc["kv_dtype"] == "fp32":
        for (p, n, s, e), stream in zip(sc["reqs"], got):
            exp = _oracle_fp32(model, scales, p, n, s, e,
                               sc["temperature"],
                               12 if sc["temperature"] > 0 else None)
            assert stream == exp, (sc, p, n, s, e)
    else:
        # canonical int8 engine: single slot, one micro-step per
        # dispatch, ample pool, no prefix cache, no speculation
        max_need = max(-(-(len(p) + n) // sc["page"])
                       for p, n, _, _ in sc["reqs"])
        want = _run_engine(
            model, scales, sc, slots=1, chunk=1,
            pool_pages=max_need + 4, reserve="full",
            prefix_cache=False, spec_draft=0)
        assert got == want, sc
