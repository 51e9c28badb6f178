"""Shared corpus-LM builder for the serving quality/benchmark tools.

Byte-level LM trained on the only real text in this offline
environment (the reference tree's docs/sources); the trained model is
the subject for speculative-decoding and KV-quantization measurements —
acceptance rates and quantization sensitivity are MODEL properties, so
the subject must actually model the text (a random-weighted LM measures
nothing, tools/spec_bench.py's 0.94x control).
"""
import glob
import os
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def corpus_bytes(max_files_per_glob: int = 40) -> np.ndarray:
    parts = []
    for g in ("/root/reference/**/*.md", "/root/reference/**/*.py"):
        for p in sorted(glob.glob(g, recursive=True))[:max_files_per_glob]:
            with open(p, "rb") as f:
                parts.append(f.read())
    return np.frombuffer(b"\n".join(parts), np.uint8).astype(np.int32)


def train_corpus_lm(corpus: np.ndarray, max_len: int = 1024,
                    d_model: int = 512, n_heads: int = 8,
                    n_layers: int = 4, seq: int = 128,
                    steps: int = 1500, batch: int = 32,
                    lr: float = 3e-3, seed: int = 0,
                    holdout_frac: float = 0.0):
    """Train the serving-config byte LM on `corpus`; returns
    (model, scales, heldout) where heldout is the untrained tail
    (empty array when holdout_frac == 0)."""
    import jax
    import jax.numpy as jnp
    import optax
    from resnet_accel_tpu.train.lm import (init_lm_fp32, lm_forward_fp32,
                                           quantize_lm)

    n_hold = int(len(corpus) * holdout_frac)
    heldout = corpus[len(corpus) - n_hold:]
    train = corpus[: len(corpus) - n_hold]

    params = init_lm_fp32(vocab=256, d_model=d_model, n_heads=n_heads,
                          d_ff=2 * d_model, n_layers=n_layers,
                          max_len=max_len, seed=seed)
    train_keys = [k for k in params if k not in ("meta", "pos")]
    pj = {k: jnp.asarray(v) for k, v in params.items() if k != "meta"}
    opt = optax.adam(lr)

    def loss_fn(tp, toks):
        full = dict(pj)
        full.update(tp)
        logits = jax.vmap(
            lambda t: lm_forward_fp32(full, t, n_layers, n_heads))(toks)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:]).mean()

    @jax.jit
    def step(tp, state, toks):
        loss, g = jax.value_and_grad(loss_fn)(tp, toks)
        upd, state = opt.update(g, state)
        return optax.apply_updates(tp, upd), state, loss

    tp = {k: pj[k] for k in train_keys}
    state = opt.init(tp)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    loss = None
    for _ in range(steps):
        starts = rng.integers(0, len(train) - seq - 1, batch)
        toks = jnp.asarray(np.stack([train[o:o + seq] for o in starts]))
        tp, state, loss = step(tp, state, toks)
    print(f"trained {steps} steps on {len(train)} corpus bytes "
          f"({time.time() - t0:.0f}s, final loss {float(loss):.3f})",
          flush=True)
    for k in train_keys:
        params[k] = np.asarray(tp[k])
    model = quantize_lm(params, n_heads, block=8)
    scales = model.calibrate(train[:max_len])
    return model, scales, heldout
