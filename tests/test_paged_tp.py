"""Tensor-parallel paged-KV engine: the PRODUCTION serving engine
sharded over a 'tp' mesh axis must be token-exact vs the single-device
engine — greedy and sampled, with admission control, preemption, prefix
caching, int8 KV pages and speculative decoding all exercised WHILE
sharded (runtime/paged_tp.py; the layout is parallel.heads' Megatron
split applied to page pools)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from resnet_accel_tpu.models.lm import TransformerLMInt8
from resnet_accel_tpu.runtime.paged import PagedKVBatcher


@pytest.fixture(scope="module")
def tp_mesh(cpu_devices):
    return Mesh(np.array(cpu_devices[:2]), ("tp",))


@pytest.fixture(scope="module")
def lm():
    model = TransformerLMInt8.from_random(
        seed=0, vocab=61, d_model=64, n_heads=4, n_layers=2,
        max_len=48, sparsity=0.5)
    rng = np.random.default_rng(1)
    scales = model.calibrate(rng.integers(0, 61, 24))
    return model, scales


def _both(lm, tp_mesh, reqs, **kw):
    """Run the same request set through the single-device and the
    tp-sharded engine; return (single results, tp results) keyed by
    submission order."""
    model, scales = lm
    single = PagedKVBatcher(model, scales, **kw)
    tp = PagedKVBatcher(model, scales, tp_mesh=tp_mesh, **kw)
    srids = [single.submit(p, n, seed=s) for p, n, s in reqs]
    trids = [tp.submit(p, n, seed=s) for p, n, s in reqs]
    sres, tres = single.run(), tp.run()
    return ([sres[r] for r in srids], [tres[r] for r in trids],
            single, tp)


def test_greedy_token_exact_vs_single_device(lm, tp_mesh):
    reqs = [([5, 9, 2, 44], 6, 0), ([7, 7, 1], 5, 0)]
    s, t, _, _ = _both(lm, tp_mesh, reqs, slots=2, page=8, pool_pages=9)
    assert t == s


def test_sampled_streams_token_exact(lm, tp_mesh):
    reqs = [([3, 1, 4], 5, 7), ([9, 9], 4, 11)]
    s, t, _, _ = _both(lm, tp_mesh, reqs, slots=2, page=8, pool_pages=9,
                       temperature=0.8, top_k=12)
    assert t == s


def test_admission_queueing_while_sharded(lm, tp_mesh):
    """Pool too small for two concurrent requests: the tp engine's
    admission control behaves identically (host scheduler is shared)
    and both requests still match the single-device engine."""
    model, scales = lm
    tp = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=4,
                        tp_mesh=tp_mesh)
    r1 = tp.submit([1, 2, 3, 4, 5, 6], n_new=6)
    r2 = tp.submit([6, 5, 4, 3, 2, 1], n_new=6)
    tp.step_engine()
    assert len(tp._active) == 1          # r2 waits for pages
    res = tp.run()
    assert tp.free_pages() == 3
    single = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=4)
    s1 = single.submit([1, 2, 3, 4, 5, 6], n_new=6)
    s2 = single.submit([6, 5, 4, 3, 2, 1], n_new=6)
    sres = single.run()
    assert res[r1] == sres[s1] and res[r2] == sres[s2]


def test_ondemand_preemption_while_sharded(lm, tp_mesh):
    """Force preemption-by-recompute under pool pressure in ondemand
    mode with the engine sharded; streams stay token-exact."""
    model, scales = lm
    kw = dict(slots=3, page=4, pool_pages=7, chunk=4,
              reserve="ondemand", temperature=0.7, top_k=9)
    reqs = [(list(range(2, 8)), 8, 1), ([9, 4], 10, 2), ([1], 9, 3)]
    s, t, single, tp = _both(lm, tp_mesh, reqs, **kw)
    assert t == s
    assert tp.preemptions == single.preemptions
    assert tp.preemptions > 0, "scenario must actually preempt"


def test_prefix_cache_while_sharded(lm, tp_mesh):
    """Shared-prefix reuse on the tp engine: second request skips its
    cached prefill and still matches the single-device engine."""
    model, scales = lm
    sys_p = list(range(10, 26))                  # 16 tokens = 2 pages
    kw = dict(slots=2, page=8, pool_pages=12, prefix_cache=True)
    outs = {}
    for name, mesh in (("single", None), ("tp", tp_mesh)):
        eng = PagedKVBatcher(model, scales, tp_mesh=mesh, **kw)
        r1 = eng.submit(sys_p + [3], 5)
        first = eng.run()[r1]
        r2 = eng.submit(sys_p + [7], 5)   # same 2-page prompt prefix
        second = eng.run()[r2]
        assert eng.cache_tokens_skipped >= 16, name
        outs[name] = (first, second)
    assert outs["tp"] == outs["single"]


def test_int8_kv_token_exact_vs_single_device_int8(lm, tp_mesh):
    """int8 KV pages quantize with the GLOBAL row absmax (pmax over
    'tp'), so each rank's page slice is bit-identical to the
    single-device int8 pool — streams must match token for token, and
    pool memory per engine is unchanged (global shape is the same;
    per-rank bytes scale 1/tp)."""
    reqs = [([5, 9, 2, 44], 8, 0), ([8, 8, 8], 6, 0)]
    s, t, single, tp = _both(lm, tp_mesh, reqs, slots=2, page=8,
                             pool_pages=9, kv_dtype="int8")
    assert t == s
    assert tp.kv_pool_bytes() == single.kv_pool_bytes()


def test_speculative_while_sharded(lm, tp_mesh):
    """spec_draft > 0 composes with tp: greedy bit-identity vs the
    non-speculative tp engine (the single-device invariant, sharded)."""
    model, scales = lm
    prompts = [([5, 9, 2, 44, 5, 9, 2], 8, 0), ([7, 3, 7, 3, 7], 6, 0)]
    plain = PagedKVBatcher(model, scales, slots=2, page=8,
                           pool_pages=12, tp_mesh=tp_mesh)
    spec = PagedKVBatcher(model, scales, slots=2, page=8,
                          pool_pages=12, tp_mesh=tp_mesh, spec_draft=3)
    prids = [plain.submit(p, n, seed=s) for p, n, s in prompts]
    srids = [spec.submit(p, n, seed=s) for p, n, s in prompts]
    pres, sres = plain.run(), spec.run()
    for pr, sr in zip(prids, srids):
        assert pres[pr] == sres[sr]


def test_adaptive_speculation_while_sharded(lm, tp_mesh):
    """spec_adaptive composes with tp: both device programs exist
    sharded, and a flip-happy switching schedule stays bit-identical
    to the non-speculative tp engine."""
    model, scales = lm
    prompts = [([5, 9, 2, 44, 5, 9, 2], 8, 0), ([7, 3, 7, 3, 7], 6, 0)]
    plain = PagedKVBatcher(model, scales, slots=2, page=8,
                           pool_pages=12, tp_mesh=tp_mesh)
    adapt = PagedKVBatcher(model, scales, slots=2, page=8,
                           pool_pages=12, tp_mesh=tp_mesh,
                           spec_draft=3, spec_adaptive=True,
                           spec_min_take=999.0, spec_probe=1,
                           spec_reprobe=2)
    prids = [plain.submit(p, n, seed=s) for p, n, s in prompts]
    arids = [adapt.submit(p, n, seed=s) for p, n, s in prompts]
    pres, ares = plain.run(), adapt.run()
    for pr, ar in zip(prids, arids):
        assert pres[pr] == ares[ar]
    assert adapt.spec_switches > 1


def test_score_matches_single_device(lm, tp_mesh):
    model, scales = lm
    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, 61, n).tolist() for n in (9, 4, 17)]
    single = PagedKVBatcher(model, scales, slots=2, page=8,
                            pool_pages=9)
    tp = PagedKVBatcher(model, scales, slots=2, page=8, pool_pages=9,
                        tp_mesh=tp_mesh)
    for a, b in zip(single.score(seqs), tp.score(seqs)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_rejects_mesh_without_tp_axis(lm, cpu_devices):
    model, scales = lm
    mesh = Mesh(np.array(cpu_devices[:2]), ("dp",))
    with pytest.raises(ValueError, match="tp"):
        PagedKVBatcher(model, scales, tp_mesh=mesh)


def test_rejects_indivisible_heads(lm, cpu_devices):
    model, scales = lm                 # n_heads=4, tp=3 does not divide
    mesh = Mesh(np.array(cpu_devices[:3]), ("tp",))
    with pytest.raises(ValueError, match="divisible"):
        PagedKVBatcher(model, scales, tp_mesh=mesh)
