"""Speculative decoding inside the paged-KV engine (spec_draft > 0):
greedy outputs bit-identical to the non-speculative engines and to
``generate``, verify windows spanning page boundaries, prefix-cache /
int8-KV / preemption composition, and the forced-accept generalization
of spec_accept_sampled that makes chunked prefill and speculative
decode one device rule.

Reference parity note: the reference has no serving stack (its
transformer artifact is a weight fixture, /root/reference/sw/exporters/
export_transformer.py:63-112); this extends the beyond-parity paged
engine (runtime/paged.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_accel_tpu.models.lm import (TransformerLMInt8,
                                        spec_accept_sampled)
from resnet_accel_tpu.runtime.paged import PagedKVBatcher


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


# A prompt with enough repetition for prompt-lookup drafts to land:
REPEAT = [7, 3, 9, 5, 7, 3, 9, 5, 7, 3, 9, 5]


def test_greedy_single_matches_generate(lm):
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12,
                       spec_draft=4)
    rid = b.submit(REPEAT, n_new=10)
    res = b.run()
    assert res[rid] == _expected(model, scales, REPEAT, 10)


def test_greedy_random_prompt_matches_generate(lm):
    # drafts mostly miss on random text -> degrades to near-vanilla
    # decode but must stay exact
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12,
                       spec_draft=3)
    prompt = [5, 9, 2, 44, 17, 1]
    rid = b.submit(prompt, n_new=8)
    res = b.run()
    assert res[rid] == _expected(model, scales, prompt, 8)


def test_interleaved_matches_nonspec_engine(lm):
    model, scales = lm
    rng = np.random.default_rng(3)
    reqs = [(rng.integers(0, 61, rng.integers(2, 9)).tolist(),
             int(rng.integers(3, 8))) for _ in range(5)]
    sb = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12,
                        spec_draft=4)
    nb = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12)
    srids = [sb.submit(p, n) for p, n in reqs]
    nrids = [nb.submit(p, n) for p, n in reqs]
    sres, nres = sb.run(), nb.run()
    for (p, n), sr, nr in zip(reqs, srids, nrids):
        assert sres[sr] == _expected(model, scales, p, n), (p, n)
        assert sres[sr] == nres[nr]


def test_verify_window_spans_page_boundary(lm):
    # page=4 < S=6: every verify window straddles at least one page
    # boundary; scatters are per-position so this must be seamless
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=1, page=4, pool_pages=14,
                       spec_draft=5)
    rid = b.submit(REPEAT, n_new=12)
    res = b.run()
    assert res[rid] == _expected(model, scales, REPEAT, 12)


def test_overhang_near_max_len_is_safe(lm):
    # total = engine max_len: the final verify windows write past the
    # request's last position.  The widened block table must land those
    # overhang writes in owned pages, never corrupt valid KV.
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=1, page=8, pool_pages=14,
                       max_pages=6, spec_draft=7)  # max_len = 48
    assert b._table_pages == 7
    prompt = REPEAT * 3                            # 36 tokens
    rid = b.submit(prompt, n_new=12)               # total = 48 = max_len
    res = b.run()
    assert res[rid] == _expected(model, scales, prompt, 12)


def test_speculation_actually_reduces_dispatches(lm):
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=1, page=8, pool_pages=12,
                       spec_draft=6)
    rid = b.submit(REPEAT, n_new=16)
    res = b.run()
    assert res[rid] == _expected(model, scales, REPEAT, 16)
    # prefill (12 tokens -> 2 windows) + decode: on this periodic
    # prompt the greedy chain keeps accepting drafts, so total
    # dispatches must be well under 1/token
    assert b.steps < 16


def test_eos_truncates_mid_window(lm):
    model, scales = lm
    ref = _expected(model, scales, REPEAT, 16)
    eos = ref[3]                  # appears early in the greedy stream
    b = PagedKVBatcher(model, scales, slots=1, page=8, pool_pages=12,
                       spec_draft=6)
    rid = b.submit(REPEAT, n_new=16, eos=eos)
    res = b.run()
    stop = ref.index(eos)         # engine stops at the FIRST occurrence
    assert res[rid] == ref[:stop + 1]   # eos token included


def test_prefix_cache_composes_with_speculation(lm):
    model, scales = lm
    sys_prompt = REPEAT + [2, 8]                   # 14 tokens
    b = PagedKVBatcher(model, scales, slots=1, page=4, pool_pages=20,
                       prefix_cache=True, spec_draft=4)
    r1 = b.submit(sys_prompt + [5], n_new=6)
    res1 = b.run()
    assert res1[r1] == _expected(model, scales, sys_prompt + [5], 6)
    r2 = b.submit(sys_prompt + [9], n_new=6)
    res2 = b.run()
    assert b.cache_hits > 0 and b.cache_tokens_skipped > 0
    assert res2[r2] == _expected(model, scales, sys_prompt + [9], 6)


def test_int8_kv_spec_matches_int8_kv_sequential(lm):
    # int8 KV is lossy vs generate(), but the spec engine writes the
    # same per-token quantized rows as the sequential engine, so the
    # two int8 engines' greedy streams must agree with EACH OTHER
    model, scales = lm
    sp = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12,
                        kv_dtype="int8", spec_draft=4)
    sq = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12,
                        kv_dtype="int8")
    reqs = [(REPEAT, 8), ([5, 9, 2, 44], 6)]
    sprids = [sp.submit(p, n) for p, n in reqs]
    sqrids = [sq.submit(p, n) for p, n in reqs]
    spres, sqres = sp.run(), sq.run()
    for srid, qrid in zip(sprids, sqrids):
        assert spres[srid] == sqres[qrid]


def test_preemption_during_speculation_stays_exact(lm):
    # ondemand + a pool too small for both requests at once: the newer
    # request gets preempted mid-speculation and recomputed; greedy
    # outputs must still match generate exactly
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=4, pool_pages=9,
                       reserve="ondemand", spec_draft=4)
    r1 = b.submit(REPEAT, n_new=12)
    r2 = b.submit([4, 4, 8, 4, 4, 8, 4, 4], n_new=10)
    res = b.run()
    assert res[r1] == _expected(model, scales, REPEAT, 12)
    assert res[r2] == _expected(model, scales,
                                [4, 4, 8, 4, 4, 8, 4, 4], 10)
    assert b.preemptions > 0      # the scenario actually preempted


def test_sampled_spec_is_deterministic_and_seed_sensitive(lm):
    model, scales = lm

    def run(seed):
        # T=3 flattens the (very peaked) target so distinct seeds
        # draw distinct streams with overwhelming probability
        b = PagedKVBatcher(model, scales, slots=2, page=8,
                           pool_pages=12, temperature=3.0,
                           spec_draft=4)
        rid = b.submit(REPEAT, n_new=10, seed=seed)
        return b.run()[rid]

    a, b_, c = run(7), run(7), run(8)
    assert a == b_
    assert len(a) == 10
    assert a != c


def test_sampled_spec_budget_and_shapes(lm):
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12,
                       temperature=0.8, spec_draft=6)
    rids = [b.submit(REPEAT, n_new=n, seed=i)
            for i, n in enumerate([3, 9, 5])]
    res = b.run()
    for rid, n in zip(rids, [3, 9, 5]):
        assert len(res[rid]) == n
        assert all(0 <= t < model.vocab for t in res[rid])


def test_spec_accept_forced_positions_always_survive():
    # n_known > 1: the leading known rows can never be the rejection
    # point even when the target gives their tokens ~zero probability
    rng = np.random.default_rng(5)
    S, V = 5, 16
    z = jnp.asarray(rng.normal(0, 2.0, (S, V)), jnp.float32)
    fed = jnp.asarray(rng.integers(0, V, S), jnp.int32)
    # make every fed token maximally unlikely
    z = z.at[jnp.arange(S - 1), fed[1:]].set(-30.0)
    for nk in range(1, S + 1):
        accepted = []
        for t in range(64):
            n_acc, emit, _ = spec_accept_sampled(
                z, fed, jax.random.PRNGKey(t), n_known=nk)
            accepted.append(int(n_acc))
        # forced rows 1..nk-1 always accepted; the unlikely drafts
        # beyond essentially never are
        assert min(accepted) >= nk - 1, (nk, min(accepted))
        assert max(accepted) <= S - 1


def test_spec_accept_default_nk_matches_legacy():
    rng = np.random.default_rng(9)
    S, V = 4, 12
    z = jnp.asarray(rng.normal(0, 1.0, (S, V)), jnp.float32)
    fed = jnp.asarray(rng.integers(0, V, S), jnp.int32)
    k = jax.random.PRNGKey(3)
    a = spec_accept_sampled(z, fed, k)
    b = spec_accept_sampled(z, fed, k, n_known=1)
    assert int(a[0]) == int(b[0])
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_constructor_validation(lm):
    model, scales = lm
    with pytest.raises(ValueError, match="spec_draft"):
        PagedKVBatcher(model, scales, spec_draft=-1)
    with pytest.raises(ValueError, match="spec_ngram"):
        PagedKVBatcher(model, scales, spec_draft=2, spec_ngram=0)
    # overhang counts against the pool bound at submit time
    b = PagedKVBatcher(model, scales, slots=1, page=8, pool_pages=4,
                       spec_draft=7)
    with pytest.raises(ValueError, match="overhang"):
        b.submit(list(range(12)), n_new=6)   # 18+7 -> 4 pages > 3
