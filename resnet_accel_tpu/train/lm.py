"""Decoder-LM training pipeline: train -> block-prune -> INT8 -> serve.

Completes the offline pipeline of SURVEY §3.1 for the transformer
family: a pure JAX/optax fp32 trainer whose architecture mirrors
models.lm.TransformerLMInt8 exactly (pre-LN blocks, sinusoidal
positions, tied readout), magnitude block-pruning of the six projection
matrices per block (the blocksparse_train.py role), and a quantizer
that packs the pruned fp32 weights into the INT8 BSR serving model via
the same per-channel quantization + BSR build as the fixture path.

The synthetic task is an affine cyclic language t_{i+1} = (a*t_i + b)
mod V — learnable by a 1-layer model in a few hundred steps, so tests
can train on CPU and then assert the INT8 model preserves next-token
accuracy end to end.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from resnet_accel_tpu.models.lm import (
    TransformerLMInt8,
    sinusoidal_positions,
)
from resnet_accel_tpu.models.transformer import (
    LN_EPS,
    TransformerBlockInt8,
    _make_projection,
)

PROJ_NAMES = ("wq", "wk", "wv", "wo", "w1", "w2")


# ==========================================================================
# FP32 model (architecture-identical to TransformerLMInt8)
# ==========================================================================

def init_lm_fp32(
    vocab: int = 32,
    d_model: int = 64,
    n_heads: int = 4,
    d_ff: int = 128,
    n_layers: int = 1,
    max_len: int = 32,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    p: Dict[str, np.ndarray] = {
        "embed": rng.normal(0, 0.5, (vocab, d_model)).astype(np.float32),
        "pos": sinusoidal_positions(max_len, d_model),
        "lnf_g": np.ones(d_model, np.float32),
        "lnf_b": np.zeros(d_model, np.float32),
        "meta": np.asarray([n_layers, n_heads], np.int32),
    }
    for i in range(n_layers):
        def w(o, inp):
            return rng.normal(0, 1.0 / np.sqrt(inp),
                              (o, inp)).astype(np.float32)

        p[f"b{i}.wq"] = w(d_model, d_model)
        p[f"b{i}.wk"] = w(d_model, d_model)
        p[f"b{i}.wv"] = w(d_model, d_model)
        p[f"b{i}.wo"] = w(d_model, d_model)
        p[f"b{i}.w1"] = w(d_ff, d_model)
        p[f"b{i}.w2"] = w(d_model, d_ff)
        for name, o in (("wq", d_model), ("wk", d_model),
                        ("wv", d_model), ("wo", d_model),
                        ("w1", d_ff), ("w2", d_model)):
            p[f"b{i}.{name}_b"] = np.zeros(o, np.float32)
        p[f"b{i}.ln1_g"] = np.ones(d_model, np.float32)
        p[f"b{i}.ln1_b"] = np.zeros(d_model, np.float32)
        p[f"b{i}.ln2_g"] = np.ones(d_model, np.float32)
        p[f"b{i}.ln2_b"] = np.zeros(d_model, np.float32)
    return p


def lm_forward_fp32(params, tokens: jnp.ndarray,
                    n_layers: int, n_heads: int) -> jnp.ndarray:
    """Causal fp32 forward [T] -> logits [T, V]; mirrors the INT8
    model's dataflow with the quantization boundaries removed."""
    T = tokens.shape[0]
    x = params["embed"][tokens] + params["pos"][:T]

    def ln(v, g, b):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + LN_EPS) * g + b

    for i in range(n_layers):
        D = x.shape[1]
        dh = D // n_heads
        h = ln(x, params[f"b{i}.ln1_g"], params[f"b{i}.ln1_b"])

        def proj(name, v):
            return v @ params[f"b{i}.{name}"].T + params[f"b{i}.{name}_b"]

        qh = proj("wq", h).reshape(T, n_heads, dh).transpose(1, 0, 2)
        kh = proj("wk", h).reshape(T, n_heads, dh).transpose(1, 0, 2)
        vh = proj("wv", h).reshape(T, n_heads, dh).transpose(1, 0, 2)
        s = jnp.einsum("htd,hsd->hts", qh, kh) / jnp.sqrt(
            jnp.float32(dh))
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None], s, -jnp.inf)
        ctx = jnp.einsum("hts,hsd->htd", jax.nn.softmax(s, -1), vh)
        ctx = ctx.transpose(1, 0, 2).reshape(T, D)
        x = x + proj("wo", ctx)
        h = ln(x, params[f"b{i}.ln2_g"], params[f"b{i}.ln2_b"])
        x = x + proj("w2", jax.nn.gelu(proj("w1", h)))

    x = ln(x, params["lnf_g"], params["lnf_b"])
    return x @ params["embed"].T


# ==========================================================================
# Synthetic task + trainer
# ==========================================================================

def cyclic_sequences(vocab: int, seq_len: int, n: int, seed: int = 0,
                     a: int = 3, b: int = 1) -> np.ndarray:
    """n sequences of the affine cyclic language t_{i+1}=(a*t_i+b)%V."""
    rng = np.random.default_rng(seed)
    t0 = rng.integers(0, vocab, n)
    seqs = np.empty((n, seq_len), np.int32)
    seqs[:, 0] = t0
    for i in range(1, seq_len):
        seqs[:, i] = (a * seqs[:, i - 1] + b) % vocab
    return seqs


def train_lm(
    params: Dict[str, np.ndarray],
    n_layers: int,
    n_heads: int,
    vocab: int,
    seq_len: int = 16,
    steps: int = 300,
    batch: int = 16,
    lr: float = 3e-3,
    seed: int = 0,
) -> Tuple[Dict[str, np.ndarray], List[float]]:
    """Adam on next-token cross-entropy over the cyclic language.
    Projections, LN and the embedding train; the sinusoidal position
    table stays fixed.  Returns (params, loss history)."""
    train_keys = [k for k in params if k != "meta" and k != "pos"]
    pj = {k: jnp.asarray(v) for k, v in params.items() if k != "meta"}
    opt = optax.adam(lr)
    state = opt.init({k: pj[k] for k in train_keys})

    def loss_fn(tp, toks):
        full = dict(pj)
        full.update(tp)
        logits = jax.vmap(
            lambda t: lm_forward_fp32(full, t, n_layers, n_heads)
        )(toks)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:]).mean()

    @jax.jit
    def step(tp, state, toks):
        loss, g = jax.value_and_grad(loss_fn)(tp, toks)
        upd, state = opt.update(g, state)
        return optax.apply_updates(tp, upd), state, loss

    tp = {k: pj[k] for k in train_keys}
    rng = np.random.default_rng(seed)
    history: List[float] = []
    for s in range(steps):
        toks = jnp.asarray(cyclic_sequences(
            vocab, seq_len, batch, seed=int(rng.integers(1 << 30))))
        tp, state, loss = step(tp, state, toks)
        history.append(float(loss))
    out = dict(params)
    for k in train_keys:
        out[k] = np.asarray(tp[k])
    return out, history


# ==========================================================================
# Block pruning + INT8 conversion
# ==========================================================================

def prune_lm_blockwise(params: Dict[str, np.ndarray], sparsity: float,
                       block: int = 8) -> Dict[str, np.ndarray]:
    """Per-matrix magnitude block pruning of the six projections of
    each layer (block L2 ranking, blocksparse_train.py semantics)."""
    out = dict(params)
    n_layers = int(params["meta"][0])
    for i in range(n_layers):
        for name in PROJ_NAMES:
            w = params[f"b{i}.{name}"].copy()
            H, W = w.shape
            ph, pw = -H % block, -W % block
            wp = np.pad(w, ((0, ph), (0, pw)))
            t = wp.reshape((H + ph) // block, block,
                           (W + pw) // block, block)
            norms = np.sqrt((t ** 2).sum(axis=(1, 3)))
            n_prune = int(norms.size * sparsity)
            if n_prune == 0:
                continue
            # Exact quota: argsort picks exactly n_prune lowest blocks
            # (a threshold comparison would prune every tied block).
            keep = np.ones(norms.size, bool)
            keep[np.argsort(norms.reshape(-1),
                            kind="stable")[:n_prune]] = False
            mask = np.repeat(np.repeat(keep.reshape(norms.shape),
                                       block, 0), block, 1)
            out[f"b{i}.{name}"] = (w * mask[:H, :W]).astype(np.float32)
    return out


def quantize_lm(params: Dict[str, np.ndarray], n_heads: int,
                block: int = 8) -> TransformerLMInt8:
    """Pack (pruned) fp32 weights into the INT8 BSR serving model."""
    n_layers = int(params["meta"][0])
    blocks = []
    for i in range(n_layers):
        kw = {
            name: _make_projection(params[f"b{i}.{name}"], block,
                                   params[f"b{i}.{name}_b"])
            for name in PROJ_NAMES
        }
        blocks.append(TransformerBlockInt8(
            ln1_g=params[f"b{i}.ln1_g"], ln1_b=params[f"b{i}.ln1_b"],
            ln2_g=params[f"b{i}.ln2_g"], ln2_b=params[f"b{i}.ln2_b"],
            n_heads=n_heads, **kw))
    return TransformerLMInt8(
        embed=params["embed"], pos=params["pos"], blocks=blocks,
        lnf_g=params["lnf_g"], lnf_b=params["lnf_b"])
