"""Paged-KV serving engine: equality with generate/sample streams and
the fixed-slot engine, page-pool admission control, and slot/page reuse.
"""

import numpy as np
import pytest

from resnet_accel_tpu.models.lm import TransformerLMInt8
from resnet_accel_tpu.runtime.paged import PagedKVBatcher
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
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=8)
    rid = b.submit([5, 9, 2, 44], n_new=6)
    res = b.run()
    assert res[rid] == _expected(model, scales, [5, 9, 2, 44], 6)


def test_interleaved_matches_generate_and_fixed_engine(lm):
    model, scales = lm
    rng = np.random.default_rng(3)
    reqs = [(rng.integers(0, 61, rng.integers(2, 9)).tolist(),
             int(rng.integers(3, 8))) for _ in range(5)]
    pb = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=9)
    cb = ContinuousBatcher(model, scales, slots=2)
    prids = [pb.submit(p, n) for p, n in reqs]
    crids = [cb.submit(p, n) for p, n in reqs]
    pres, cres = pb.run(), cb.run()
    for (p, n), pr, cr in zip(reqs, prids, crids):
        exp = _expected(model, scales, p, n)
        assert pres[pr] == exp, (p, n)
        assert cres[cr] == exp, (p, n)


def test_sampled_streams_match_sample(lm):
    import jax
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=9,
                       temperature=0.8, top_k=12)
    prompts = {b.submit([3, 1, 4], 5, seed=7): ([3, 1, 4], 5, 7),
               b.submit([9, 9], 4, seed=11): ([9, 9], 4, 11)}
    res = b.run()
    for rid, (prompt, n_new, seed) in prompts.items():
        exp = model.sample(np.asarray(prompt, np.int32), n_new, scales,
                           jax.random.PRNGKey(seed), temperature=0.8,
                           top_k=12)
        assert res[rid] == [int(t) for t in np.asarray(exp)], rid


def test_page_admission_control(lm):
    """With a pool too small for two concurrent requests, the second
    queues until the first completes and releases its pages."""
    model, scales = lm
    # each request needs 2 pages (page=8, prompt 3 + n_new 5 = 8 -> 1
    # page, use longer): prompt 6 + 6 = 12 -> 2 pages; pool has 3
    # allocatable -> only one such request fits at a time.
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=4)
    r1 = b.submit([1, 2, 3, 4, 5, 6], n_new=6)
    r2 = b.submit([6, 5, 4, 3, 2, 1], n_new=6)
    assert b.free_pages() == 3
    b.step_engine()
    # r1 admitted (2 pages), r2 must wait (needs 2, only 1 free)
    assert len(b._active) == 1
    res = b.run()
    assert b.free_pages() == 3          # all pages returned
    assert res[r1] == _expected(model, scales, [1, 2, 3, 4, 5, 6], 6)
    assert res[r2] == _expected(model, scales, [6, 5, 4, 3, 2, 1], 6)


def test_oversubscription_capacity(lm):
    """Block-table capacity (max_len) is NOT a memory commitment: a
    2-slot engine whose pool holds far fewer pages than
    slots*max_pages still serves requests of very different lengths."""
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=4, pool_pages=9,
                       max_pages=10)          # capacity 40 > pool 32
    assert b.max_len == 40
    long_p = list(range(1, 13))               # 12 + 8 = 20 -> 5 pages
    short_p = [2, 3]                          # 2 + 2 = 4 -> 1 page
    r1 = b.submit(long_p, n_new=8)
    r2 = b.submit(short_p, n_new=2)
    res = b.run()
    assert res[r1] == _expected(model, scales, long_p, 8)
    assert res[r2] == _expected(model, scales, short_p, 2)


def test_rejects_never_admissible(lm):
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=1, page=4, pool_pages=3,
                       max_pages=10)
    with pytest.raises(ValueError, match="never"):
        b.submit(list(range(1, 20)), n_new=10)


def test_eos_early_stop(lm):
    model, scales = lm
    full = _expected(model, scales, [5, 9, 2, 44], 8)
    eos = full[2]
    b = PagedKVBatcher(model, scales, slots=1, page=8, pool_pages=4)
    rid = b.submit([5, 9, 2, 44], n_new=8, eos=eos)
    res = b.run()
    # contract: stop at the FIRST emitted eos, inclusive
    cut = full.index(eos) + 1
    assert res[rid] == full[:cut]
    assert res[rid][-1] == eos and len(res[rid]) < len(full)


class TestOndemandPreemption:
    """reserve="ondemand": optimistic admission, lazy page growth, and
    preemption-by-recompute when the pool runs dry."""

    def test_outputs_identical_to_full_reserve(self, lm):
        model, scales = lm
        rng = np.random.default_rng(5)
        reqs = [(rng.integers(0, 61, rng.integers(2, 9)).tolist(),
                 int(rng.integers(3, 8))) for _ in range(6)]
        # pool tight enough to force growth contention + preemption
        b = PagedKVBatcher(model, scales, slots=3, page=4,
                           pool_pages=6, reserve="ondemand", chunk=4)
        rids = [b.submit(p, n) for p, n in reqs]
        res = b.run()
        for (p, n), rid in zip(reqs, rids):
            assert res[rid] == _expected(model, scales, p, n), (p, n)

    def test_preemption_fires_and_preserves_sampled_streams(self, lm):
        import jax
        model, scales = lm
        # Two long sampled requests on a pool that cannot hold both to
        # completion: the newer one must be preempted at least once,
        # and both streams still equal the per-sequence sample() runs.
        b = PagedKVBatcher(model, scales, slots=2, page=4,
                           pool_pages=8, reserve="ondemand", chunk=4,
                           temperature=0.9, top_k=8)
        specs = [([3, 1, 4, 1, 5], 14, 7), ([2, 7, 1, 8], 14, 11)]
        rids = [b.submit(p, n, seed=s) for p, n, s in specs]
        res = b.run()
        assert b.preemptions >= 1
        for (p, n, s), rid in zip(specs, rids):
            exp = model.sample(np.asarray(p, np.int32), n, scales,
                               jax.random.PRNGKey(s), temperature=0.9,
                               top_k=8)
            assert res[rid] == [int(t) for t in np.asarray(exp)], rid

    def test_long_request_does_not_starve_short_ones(self, lm):
        """Head-of-line: with full reservation the pool can only hold
        the long request, so shorts wait; ondemand admits them
        concurrently and they FINISH while the long one is running."""
        model, scales = lm
        long_p, long_n = [1, 2, 3, 4], 28       # 32 positions
        short = ([7, 8], 4)                     # 6 positions

        def first_done_step(reserve):
            b = PagedKVBatcher(model, scales, slots=2, page=4,
                               pool_pages=10, reserve=reserve, chunk=4)
            rl = b.submit(long_p, long_n)
            rs = b.submit(*short)
            steps_to_short = None
            for step in range(100):
                if not b.step_engine():
                    break
                if rs in b.results() and steps_to_short is None:
                    steps_to_short = step
            res = b.results()
            assert res[rl] == _expected(model, scales, long_p, long_n)
            assert res[rs] == _expected(model, scales, *short)
            return steps_to_short if steps_to_short is not None else 999

        # full reservation: long takes 8 of 9 allocatable pages, the
        # short (2 pages) cannot coexist -> finishes only after long
        t_full = first_done_step("full")
        t_ond = first_done_step("ondemand")
        assert t_ond < t_full

    def test_fifo_priority_oldest_never_preempted(self, lm):
        model, scales = lm
        b = PagedKVBatcher(model, scales, slots=2, page=4,
                           pool_pages=6, reserve="ondemand", chunk=4)
        r_old = b.submit([1, 2, 3], 12)
        r_new = b.submit([4, 5, 6], 12)
        res = b.run()
        # both complete and are correct; any preemption hit the newer
        assert res[r_old] == _expected(model, scales, [1, 2, 3], 12)
        assert res[r_new] == _expected(model, scales, [4, 5, 6], 12)


class TestPrefixCache:
    """vLLM-style prefix caching: shared prompt pages skip prefill,
    outputs stay token-identical, and cached pages reclaim under
    pool pressure."""

    def test_repeat_prompt_skips_prefill_same_outputs(self, lm):
        model, scales = lm
        sys_prompt = list(range(1, 17))          # 2 full pages at page=8
        b0 = PagedKVBatcher(model, scales, slots=1, page=8,
                            pool_pages=12)
        b1 = PagedKVBatcher(model, scales, slots=1, page=8,
                            pool_pages=12, prefix_cache=True)
        outs = {}
        for b in (b0, b1):
            r1 = b.submit(sys_prompt + [21], n_new=5)
            res1 = b.run()
            r2 = b.submit(sys_prompt + [33, 7], n_new=5)
            res2 = b.run()
            outs[b] = (res1[r1], res2[r2])
        assert outs[b0] == outs[b1]              # caching is invisible
        assert outs[b1][0] == _expected(model, scales,
                                        sys_prompt + [21], 5)
        assert outs[b1][1] == _expected(model, scales,
                                        sys_prompt + [33, 7], 5)
        # the second request reused both full prompt pages and skipped
        # 16 prefill micro-steps
        assert b1.cache_hits == 2
        assert b1.cache_tokens_skipped == 16
        assert b1.micro_steps < b0.micro_steps
        assert b0.cache_hits == 0

    def test_concurrent_same_prompt_share_pages(self, lm):
        model, scales = lm
        sys_prompt = list(range(2, 12))          # 1 full page at page=8
        b = PagedKVBatcher(model, scales, slots=2, page=8,
                           pool_pages=16, prefix_cache=True)
        # first request retires and caches its prompt page
        r0 = b.submit(sys_prompt + [5], n_new=4)
        base = b.run()[r0]
        assert base == _expected(model, scales, sys_prompt + [5], 4)
        # two concurrent requests both share that page (refcount 2);
        # n_new is sized so neither finishes within the first chunk
        ra = b.submit(sys_prompt + [6], n_new=16)
        rb = b.submit(sys_prompt + [7], n_new=16)
        b.step_engine()
        shared_pid = [pid for pid, ref in b._page_ref.items() if ref]
        assert shared_pid and b._page_ref[shared_pid[0]] == 2
        res = b.run()
        assert res[ra] == _expected(model, scales, sys_prompt + [6], 16)
        assert res[rb] == _expected(model, scales, sys_prompt + [7], 16)
        # pages released: nothing referenced after both retire
        assert all(ref == 0 for ref in b._page_ref.values())

    def test_cache_reclaims_under_pool_pressure(self, lm):
        model, scales = lm
        b = PagedKVBatcher(model, scales, slots=1, page=8,
                           pool_pages=5, prefix_cache=True)
        # fill the cache: 2 prompt pages cached after completion
        p1 = list(range(1, 17))
        r1 = b.submit(p1 + [20], n_new=4)
        out1 = b.run()[r1]
        assert len(b._cache) == 2
        # an unrelated request needing all 4 allocatable pages must
        # reclaim the cached pages (LRU) and still run correctly
        p2 = [40] * 20
        r2 = b.submit(p2, n_new=12)              # 32 positions -> 4 pages
        out2 = b.run()[r2]
        assert out2 == _expected(model, scales, p2, 12)
        # p1's cached pages were reclaimed to serve p2 (whose own
        # prompt pages now occupy the cache)
        assert b._chain_key(p1, 0) not in b._cache
        assert b._chain_key(p2, 0) in b._cache
        # and the original prompt still produces the same tokens when
        # resubmitted (cold or warm — correctness is cache-independent)
        r3 = b.submit(p1 + [20], n_new=4)
        assert b.run()[r3] == out1

    def test_sampled_streams_unaffected_by_cache(self, lm):
        import jax
        model, scales = lm
        sys_prompt = list(range(3, 12))          # 1 full page
        b = PagedKVBatcher(model, scales, slots=1, page=8,
                           pool_pages=10, prefix_cache=True,
                           temperature=0.8, top_k=12)
        r1 = b.submit(sys_prompt + [2], n_new=5, seed=13)
        b.run()
        r2 = b.submit(sys_prompt + [2], n_new=5, seed=13)  # warm cache
        res2 = b.run()[r2]
        assert b.cache_tokens_skipped >= 8
        exp = model.sample(np.asarray(sys_prompt + [2], np.int32), 5,
                           scales, jax.random.PRNGKey(13),
                           temperature=0.8, top_k=12)
        assert res2 == [int(t) for t in np.asarray(exp)]

    def test_preempted_request_resumes_from_cache(self, lm):
        model, scales = lm
        # tight on-demand pool forces preemption; with the cache on,
        # the evicted request's already-computed prompt pages survive
        # and its recompute is skipped on re-admission.
        reqs = [(list(range(1, 10)) + [i], 8) for i in range(4)]
        roomy = PagedKVBatcher(model, scales, slots=4, page=8,
                               pool_pages=24, reserve="ondemand",
                               prefix_cache=True)
        tight = PagedKVBatcher(model, scales, slots=4, page=8,
                               pool_pages=7, reserve="ondemand",
                               prefix_cache=True)
        r_roomy = [roomy.submit(p, n) for p, n in reqs]
        r_tight = [tight.submit(p, n) for p, n in reqs]
        res_roomy, res_tight = roomy.run(), tight.run()
        assert tight.preemptions > 0
        for rr, rt in zip(r_roomy, r_tight):
            assert res_roomy[rr] == res_tight[rt]
        assert tight.cache_tokens_skipped > 0


class TestInt8KV:
    """Quantized KV page pools: ~3.9x less memory, near-identical
    outputs (per-token symmetric int8, dequant after gather)."""

    def test_pool_memory_and_agreement(self, lm):
        model, scales = lm
        reqs = [(np.random.default_rng(i).integers(0, 61, 6).tolist(),
                 6) for i in range(4)]
        outs, bytes_ = {}, {}
        for dt in ("fp32", "int8"):
            b = PagedKVBatcher(model, scales, slots=2, page=8,
                               pool_pages=9, kv_dtype=dt)
            rids = [b.submit(p, n) for p, n in reqs]
            res = b.run()
            outs[dt] = [res[r] for r in rids]
            bytes_[dt] = b.kv_pool_bytes()
        assert bytes_["fp32"] / bytes_["int8"] > 3.5
        # tiny-model greedy decode: int8 KV matches fp32 exactly here
        # (documented as near-identical, not guaranteed bit-equal)
        match = sum(sum(x == y for x, y in zip(a, c))
                    for a, c in zip(outs["fp32"], outs["int8"]))
        total = sum(len(a) for a in outs["fp32"])
        assert match / total >= 0.9

    def test_composes_with_prefix_cache_and_ondemand(self, lm):
        model, scales = lm
        sys_prompt = list(range(2, 12))
        b = PagedKVBatcher(model, scales, slots=2, page=8,
                           pool_pages=10, kv_dtype="int8",
                           prefix_cache=True, reserve="ondemand")
        r1 = b.submit(sys_prompt + [5], n_new=4)
        out1 = b.run()[r1]
        r2 = b.submit(sys_prompt + [5], n_new=4)   # warm: cache hit
        out2 = b.run()[r2]
        assert out1 == out2                        # deterministic reuse
        assert b.cache_tokens_skipped >= 8

    def test_rejects_unknown_dtype(self, lm):
        model, scales = lm
        with pytest.raises(ValueError, match="kv_dtype"):
            PagedKVBatcher(model, scales, kv_dtype="fp8")


# ---------------------------------------------------------------------------
# Teacher-forced scoring through the paged path (the perplexity endpoint)
# ---------------------------------------------------------------------------

def _golden_logprobs(model, scales, seq):
    import jax
    import jax.numpy as jnp
    logits = model.forward(jnp.asarray(seq, jnp.int32), scales)
    lp = np.asarray(jax.nn.log_softmax(
        logits.astype(jnp.float32), axis=-1))
    return lp[np.arange(len(seq) - 1), np.asarray(seq[1:])]


def test_score_matches_teacher_forced_forward(lm):
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=16)
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 61, n).tolist() for n in (17, 9, 30, 3, 2)]
    out = b.score(seqs)
    for seq, lp in zip(seqs, out):
        want = _golden_logprobs(model, scales, seq)
        assert lp.shape == (len(seq) - 1,)
        np.testing.assert_allclose(lp, want, rtol=2e-4, atol=2e-4)
    # pool fully returned, engine reusable
    assert len(b._free) == b.pool_pages - 1
    rid = b.submit(seqs[0][:6], n_new=4)
    assert b.run()[rid] == _expected(model, scales, seqs[0][:6], 4)


def test_score_short_and_empty_sequences(lm):
    model, scales = lm
    b = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=12)
    out = b.score([[5], [], [3, 4, 5]])
    assert out[0].shape == (0,) and out[1].shape == (0,)
    assert out[2].shape == (2,)


def test_score_int8_kv_close_but_lossy(lm):
    """int8-KV scoring runs the quantized gather path: log-probs stay
    close to fp32 (quality) but the pool is 4x smaller; exactness is
    NOT expected."""
    model, scales = lm
    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 61, 33).tolist() for _ in range(3)]
    fp = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=16)
    q8 = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=16,
                        kv_dtype="int8")
    lp_fp = fp.score(seqs)
    lp_q8 = q8.score(seqs)
    for a, c in zip(lp_fp, lp_q8):
        # mean absolute log-prob shift stays small on this model
        assert np.abs(a - c).mean() < 0.05
