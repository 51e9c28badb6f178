"""LM pipeline: train (fp32) -> block-prune -> INT8 -> serve."""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu.train.lm import (
    cyclic_sequences,
    init_lm_fp32,
    lm_forward_fp32,
    prune_lm_blockwise,
    quantize_lm,
    train_lm,
)

VOCAB, D, HEADS, LAYERS = 16, 64, 4, 1


@pytest.fixture(scope="module")
def trained():
    p = init_lm_fp32(vocab=VOCAB, d_model=D, n_heads=HEADS, d_ff=128,
                     n_layers=LAYERS, max_len=32, seed=0)
    p, hist = train_lm(p, LAYERS, HEADS, VOCAB, seq_len=12, steps=250,
                       batch=16, seed=0)
    return p, hist


def next_token_accuracy_fp32(p, toks):
    logits = np.asarray(lm_forward_fp32(
        {k: jnp.asarray(v) for k, v in p.items() if k != "meta"},
        jnp.asarray(toks), LAYERS, HEADS))
    return float((logits[:-1].argmax(-1) == toks[1:]).mean())


class TestTrainLM:
    def test_loss_decreases(self, trained):
        _, hist = trained
        assert np.mean(hist[-20:]) < 0.5 * np.mean(hist[:20])

    def test_learns_cyclic_language(self, trained):
        p, _ = trained
        toks = cyclic_sequences(VOCAB, 12, 1, seed=123)[0]
        assert next_token_accuracy_fp32(p, toks) >= 0.8


class TestPruneQuota:
    def test_uniform_norms_prune_exact_quota(self):
        # Every block norm equal: a threshold comparison would zero the
        # whole matrix; argsort must prune exactly the quota.
        p = init_lm_fp32(vocab=VOCAB, d_model=D, n_heads=HEADS,
                         d_ff=128, n_layers=1, max_len=8, seed=1)
        for name in ("wq", "wk", "wv", "wo", "w1", "w2"):
            p[f"b0.{name}"] = np.ones_like(p[f"b0.{name}"])
        out = prune_lm_blockwise(p, sparsity=0.25, block=8)
        w = out["b0.wq"]
        t = w.reshape(D // 8, 8, D // 8, 8)
        zero_blocks = int((np.abs(t).sum(axis=(1, 3)) == 0).sum())
        assert zero_blocks == int((D // 8) ** 2 * 0.25)


class TestPruneQuantizeServe:
    def test_pruned_int8_preserves_accuracy(self, trained):
        p, _ = trained
        pruned = prune_lm_blockwise(p, sparsity=0.3, block=8)
        lm = quantize_lm(pruned, HEADS, block=8)
        # the pruning actually removed blocks
        sp = lm.blocks[0].sparsity_report()
        assert all(s >= 0.25 for s in sp.values())

        toks = cyclic_sequences(VOCAB, 12, 1, seed=321)[0]
        scales = lm.calibrate(toks)
        logits = np.asarray(lm.forward(jnp.asarray(toks), scales))
        acc = float((logits[:-1].argmax(-1) == toks[1:]).mean())
        assert acc >= 0.7

    def test_int8_generate_continues_cycle(self, trained):
        p, _ = trained
        lm = quantize_lm(prune_lm_blockwise(p, 0.2, 8), HEADS, 8)
        toks = cyclic_sequences(VOCAB, 8, 1, seed=7)[0]
        scales = lm.calibrate(toks)
        out = np.asarray(lm.generate(jnp.asarray(toks[:6]), 4, scales))
        want = [(3 * t + 1) % VOCAB for t in
                np.concatenate([toks[5:6], out[:-1]])]
        # greedy continuation should mostly follow the affine rule
        assert (out == np.asarray(want)).mean() >= 0.5
