"""Real-data accuracy curve: ResNet-18 through the FULL pipeline.

Reference flow being reproduced (sw/training/blocksparse_train.py:282-321
progressive 50->90% pruning with validation gates; sw/INT8 quantization/
quantize_resnet18.py:103-160 N-batch calibration with outlier clipping;
sparse INT8 serving):

    fp32 train -> progressive block pruning (validate each level)
    -> per-channel INT8 PTQ with N-batch percentile calibration
    -> zero-skip BSR sparse INT8 serving

Data: the only real image set in this environment is MNIST t10k (the
train split's image file is absent from /root/reference/data/MNIST/raw).
Protocol, documented in docs/ACCURACY.md: the 10k real test images are
seed-0 shuffled; each fold holds out a rotating 2,000-image window and
trains on the other 8,000.  With --folds 5 every one of the 10k images
is scored exactly once as a held-out example (a full 10k evaluation),
and per-stage accuracies are reported as mean over folds with a pooled
10k binomial CI.

Statistics: every accuracy carries a 95% binomial CI.  The fp32->INT8
deltas are PAIRED (same held-out images, discordant-pair counts), which
is the statistically efficient comparison for small deltas: its CI
scales with the number of disagreements, not the number of images.

Sparsity: levels are gated on the PARAMETER-weighted effective sparsity
(blocksparse.effective_sparsity), not the block count — per-layer block
configs are sized so the 90% schedule endpoint is actually reachable
(layer_block_cfg discipline, blocksparse_train.py:52): the big >=256-ch
layers (93% of conv weights) prune at the MXU-native 128x128 serving
block with a 2% keep floor; 128-ch layers at 32x32 keep >=10%; the
small layer1 convs keep >=30% as in the reference.

Writes docs/accuracy_curve.json and prints the markdown table for
docs/ACCURACY.md.

Run: python tools/accuracy_curve.py --folds 5   (TPU ~1h; CPU much slower)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MNIST_RAW = "/root/reference/data/MNIST/raw"
OUT_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "accuracy_curve.json")

MEAN, STD = 0.1307, 0.3081
SCHEDULE = (0.5, 0.7, 0.85, 0.9)
EPOCHS_DENSE = 6
EPOCHS_FINETUNE = 2
BATCH = 128
CALIB_N = 512
PERCENTILE = 99.9   # activation-calibration clip (reference discipline)
EPOCHS_QAT = 2
# Fine-tune LR: Adam's effective per-step magnitude is ~lr regardless of
# gradient scale, so 124 steps at 5e-4 moves converged conv weights
# (|w| ~ 0.05) off their optimum — measured −4.85% on fold 1 before this
# was lowered.  5e-5 keeps the fine-tune a perturbation of the trained
# trunk, which is what QAT is (adapt to the grid, don't retrain).
QAT_LR = 5e-5


def load_all(seed: int = 0):
    from resnet_accel_tpu.utils.mnist_data import load_mnist_split
    imgs, labels = load_mnist_split(MNIST_RAW, "t10k")
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(imgs))
    imgs, labels = imgs[perm], labels[perm]
    x = (imgs.astype(np.float32) / 255.0 - MEAN) / STD
    x = np.pad(x, ((0, 0), (2, 2), (2, 2)))          # 28 -> 32
    x = np.repeat(x[:, None, :, :], 3, axis=1)        # 1ch -> 3ch
    return x, labels.astype(np.int32)


def fold_split(x, y, fold: int, n_val: int = 2000):
    """Rotate a held-out window over the shuffled 10k."""
    lo, hi = fold * n_val, (fold + 1) * n_val
    xva, yva = x[lo:hi], y[lo:hi]
    xtr = np.concatenate([x[:lo], x[hi:]])
    ytr = np.concatenate([y[:lo], y[hi:]])
    return (xtr, ytr), (xva, yva)


def preds_fp32(params, bn_state, x, small_input=True, batch=500):
    import jax
    import jax.numpy as jnp
    from resnet_accel_tpu.train.resnet18 import resnet18_forward

    @jax.jit
    def fwd(p, s, xb):
        logits, _ = resnet18_forward(p, s, xb, small_input, False)
        return logits.argmax(-1)

    out = [np.asarray(fwd(params, bn_state, jnp.asarray(x[i:i + batch])))
           for i in range(0, len(x), batch)]
    return np.concatenate(out)


def preds_int8(model, x, batch=500, use_pallas=True):
    import jax
    import jax.numpy as jnp
    from resnet_accel_tpu.models.resnet18 import make_forward

    params = model.as_device_params()
    fwd = jax.jit(make_forward(model, use_pallas=use_pallas))
    out = [np.asarray(fwd(params, jnp.asarray(x[i:i + batch]))).argmax(-1)
           for i in range(0, len(x), batch)]
    return np.concatenate(out)


def ci95(p: float, n: int) -> float:
    """95% binomial CI half-width (normal approximation)."""
    return 1.96 * float(np.sqrt(max(p * (1 - p), 1e-12) / n))


def paired_delta(pred_a, pred_b, y):
    """Paired comparison of two classifiers on the SAME examples.

    Returns (delta_acc b-a, ci95 half-width, n01, n10): n01 = a right &
    b wrong, n10 = a wrong & b right.  The delta's variance comes only
    from discordant pairs (McNemar), so tiny deltas get tight CIs.
    """
    a_ok, b_ok = pred_a == y, pred_b == y
    n01 = int((a_ok & ~b_ok).sum())
    n10 = int((~a_ok & b_ok).sum())
    n = len(y)
    delta = (n10 - n01) / n
    half = 1.96 * np.sqrt(max(n01 + n10 - (n10 - n01) ** 2 / n, 0.0)) / n
    return delta, float(half), n01, n10


def make_cfgs(params_np):
    """Per-layer block configs sized so 90% global sparsity is reachable.

    The >=256-channel layers hold ~93% of conv weights: prune them at
    the MXU-native 128x128 serving block with a 2% keep floor.  128-ch
    layers keep >=10% at 32x32; the small 64-ch layer1 convs keep the
    reference's 30% floor (they are 1.3% of the weights — their floor
    no longer binds the global target).
    """
    from resnet_accel_tpu.train.blocksparse import BlockCfg, DEFAULT_CONV_CFG
    cfgs = {}
    for k, v in params_np.items():
        if not (k.endswith(".weight") and v.ndim == 4
                and "downsample" not in k and k != "conv1.weight"):
            continue
        out_c = v.shape[0]
        if out_c >= 256:
            cfgs[k] = BlockCfg(128, 128, 0.02)
        elif out_c >= 128:
            cfgs[k] = BlockCfg(32, 32, 0.10)
        else:
            cfgs[k] = DEFAULT_CONV_CFG
    return cfgs


def run_fold(fold, x, y, n_val, t0, qat=True):
    from resnet_accel_tpu.models.resnet18 import (attach_bsr,
                                                  quantize_resnet18)
    from resnet_accel_tpu.train.blocksparse import (
        effective_sparsity, prune_blocks_global, make_mask_fn,
        make_group_lasso_fn, sparsity_of_masks)
    from resnet_accel_tpu.train.resnet18 import (
        export_inference_params, merge_params, train_resnet18)

    (xtr, ytr), (xva, yva) = fold_split(x, y, fold, n_val)
    r = {"fold": fold}

    # ---- 1. dense fp32 training -----------------------------------------
    state = train_resnet18(xtr, ytr, epochs=EPOCHS_DENSE,
                           batch_size=BATCH, lr=0.05, seed=0,
                           num_classes=10, small_input=True)
    p_dense = preds_fp32(state.params, state.bn_state, xva)
    r["fp32_dense"] = float((p_dense == yva).mean())
    print(f"[fold {fold}] fp32 dense: {r['fp32_dense']:.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # ---- 1b. PTQ of the DENSE model: the pure quantization delta ---------
    flat_dense = export_inference_params(state)
    mdl_dense = quantize_resnet18(
        flat_dense, xtr[:CALIB_N], num_classes=10, small_input=True,
        calib_batch_size=128, calib_percentile=PERCENTILE)
    p_dense_i8 = preds_int8(mdl_dense, xva)
    r["int8_of_dense"] = float((p_dense_i8 == yva).mean())
    d, h, n01, n10 = paired_delta(p_dense, p_dense_i8, yva)
    r["ptq_paired"] = {"delta": d, "ci95": h, "n01": n01, "n10": n10}
    print(f"[fold {fold}] int8(dense): {r['int8_of_dense']:.4f} "
          f"paired delta {d:+.4f} +-{h:.4f} (n01={n01} n10={n10})",
          flush=True)

    # ---- 2. progressive pruning with validation gates --------------------
    params_np = {k: np.asarray(v) for k, v in state.params.items()}
    cfgs = make_cfgs(params_np)
    shapes = {k: params_np[k].shape for k in cfgs}
    reg_fn = make_group_lasso_fn(cfgs, 1e-4)

    masks, cur, levels = None, state, []
    for level in SCHEDULE:
        merged = merge_params(
            {k: np.asarray(v) for k, v in cur.params.items()},
            {k: np.asarray(v) for k, v in cur.bn_state.items()})
        masks = prune_blocks_global(
            {k: np.asarray(cur.params[k]) for k in cfgs}, level, cfgs,
            normalize=True, by_params=True)
        mask_fn = make_mask_fn(masks, cfgs, shapes)
        cur = train_resnet18(
            xtr, ytr, epochs=EPOCHS_FINETUNE, batch_size=BATCH,
            lr=0.01, seed=1, num_classes=10, small_input=True,
            mask_fn=mask_fn, reg_fn=reg_fn, init=merged)
        cur.params.update({k: v for k, v in mask_fn(cur.params).items()})
        eff = effective_sparsity(masks, cfgs, shapes)
        blk = sparsity_of_masks(masks)
        p_lv = preds_fp32(cur.params, cur.bn_state, xva)
        acc = float((p_lv == yva).mean())
        print(f"[fold {fold}] pruned @{level:.0%} eff(param) {eff:.1%} "
              f"blocks {blk:.1%} acc {acc:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        levels.append({"target": level,
                       "effective_param_sparsity": eff,
                       "block_sparsity": blk, "fp32_val_acc": acc})
    r["levels"] = levels
    p_pruned = preds_fp32(cur.params, cur.bn_state, xva)

    # ---- 3. PTQ of the pruned model (percentile calibration) -------------
    flat = export_inference_params(cur)
    model = quantize_resnet18(flat, xtr[:CALIB_N], num_classes=10,
                              small_input=True, calib_batch_size=128,
                              calib_percentile=PERCENTILE)
    p_i8 = preds_int8(model, xva)
    r["int8_of_pruned"] = float((p_i8 == yva).mean())
    d, h, n01, n10 = paired_delta(p_pruned, p_i8, yva)
    r["pruned_ptq_paired"] = {"delta": d, "ci95": h, "n01": n01,
                              "n10": n10}
    print(f"[fold {fold}] int8(pruned@90%): {r['int8_of_pruned']:.4f} "
          f"paired delta {d:+.4f} +-{h:.4f}", flush=True)

    # ---- 3b. QAT at the 90% level: quant-aware fine-tune THROUGH the
    # deployed arithmetic (frozen-BN fold + per-channel weight fake-quant
    # + fixed percentile-calibrated activation taps), masks re-applied
    # every step, then the same PTQ export ---------------------------------
    if qat:
        from resnet_accel_tpu.train.qat import qat_finetune_resnet
        flat_q = qat_finetune_resnet(
            merge_params(
                {k: np.asarray(v) for k, v in cur.params.items()},
                {k: np.asarray(v) for k, v in cur.bn_state.items()}),
            xtr, ytr, epochs=EPOCHS_QAT, batch_size=BATCH, lr=QAT_LR,
            seed=2, small_input=True, mask_fn=mask_fn,
            calib_x=xtr[:CALIB_N], calib_batch_size=128,
            calib_percentile=PERCENTILE)
        model_q = quantize_resnet18(
            flat_q, xtr[:CALIB_N], num_classes=10, small_input=True,
            calib_batch_size=128, calib_percentile=PERCENTILE)
        # Diagnostic: the QAT'd trunk's own fp32 accuracy separates
        # "fine-tune damaged the model" from "export/PTQ mismatch".
        from resnet_accel_tpu.train.resnet18 import split_params
        qp, qbn = split_params(flat_q)
        p_fq = preds_fp32(qp, qbn, xva)
        r["fp32_of_qat"] = float((p_fq == yva).mean())
        p_i8q = preds_int8(model_q, xva)
        r["int8_of_pruned_qat"] = float((p_i8q == yva).mean())
        d, h, n01, n10 = paired_delta(p_pruned, p_i8q, yva)
        r["pruned_qat_paired"] = {"delta": d, "ci95": h, "n01": n01,
                                  "n10": n10}
        print(f"[fold {fold}] int8(pruned@90% QAT): "
              f"{r['int8_of_pruned_qat']:.4f} (fp32 trunk after QAT "
              f"{r['fp32_of_qat']:.4f}) paired delta vs pruned fp32 "
              f"{d:+.4f} +-{h:.4f} ({time.time() - t0:.0f}s)",
              flush=True)
    else:
        p_i8q = p_i8

    # ---- 4. sparse INT8 serving (zero-skip BSR) ---------------------------
    sparse = attach_bsr(model, block=128, min_sparsity=0.25)
    n_sparse = sum(1 for _, qc in sparse.named_convs()
                   if qc.bsr is not None)
    p_sp = preds_int8(sparse, xva)
    r["int8_sparse"] = float((p_sp == yva).mean())
    r["bsr_layers"] = n_sparse
    ok = bool((p_sp == p_i8).all())
    r["sparse_matches_dense_serving"] = ok
    print(f"[fold {fold}] INT8 sparse ({n_sparse} BSR layers): "
          f"{r['int8_sparse']:.4f} "
          f"{'== dense-serving preds' if ok else '(differs)'}", flush=True)
    # per-image correctness for pooled stats
    r["_pool"] = {"dense": p_dense, "dense_i8": p_dense_i8,
                  "pruned": p_pruned, "pruned_i8": p_i8,
                  "pruned_i8_qat": p_i8q, "y": yva}
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folds", type=int, default=1,
                    help="rotating held-out folds (5 = full 10k eval)")
    ap.add_argument("--no-qat", action="store_true",
                    help="skip the stage-3b quant-aware fine-tune")
    args = ap.parse_args()

    t0 = time.time()
    x, y = load_all()
    n_val = len(x) // 5
    results = {"protocol": f"MNIST t10k seed-0 shuffle; {args.folds} "
                           f"rotating fold(s) of {n_val} held-out / "
                           f"{len(x) - n_val} train; 32x32x3 inputs",
               "schedule": list(SCHEDULE),
               "calib_percentile": PERCENTILE,
               "folds": []}

    pools = {k: [] for k in ("dense", "dense_i8", "pruned", "pruned_i8",
                             "pruned_i8_qat", "y")}
    for fold in range(args.folds):
        r = run_fold(fold, x, y, n_val, t0, qat=not args.no_qat)
        pool = r.pop("_pool")
        for k in pools:
            pools[k].append(pool[k])
        results["folds"].append(r)

    # ---- pooled statistics -------------------------------------------------
    P = {k: np.concatenate(v) for k, v in pools.items()}
    n = len(P["y"])
    summary = {"n_pooled": n}
    for name, key in (("fp32_dense", "dense"), ("int8_of_dense",
                      "dense_i8"), ("fp32_pruned90", "pruned"),
                      ("int8_of_pruned90", "pruned_i8")):
        acc = float((P[key] == P["y"]).mean())
        summary[name] = {"acc": acc, "ci95": ci95(acc, n)}
    for name, a, b in (("ptq_dense", "dense", "dense_i8"),
                       ("ptq_pruned", "pruned", "pruned_i8"),
                       ("qat_pruned", "pruned", "pruned_i8_qat")):
        d, h, n01, n10 = paired_delta(P[a], P[b], P["y"])
        summary[name + "_paired_delta"] = {
            "delta": d, "ci95": h, "n01": n01, "n10": n10}
    results["summary"] = summary

    # level aggregates across folds
    lv_agg = []
    for i, target in enumerate(SCHEDULE):
        accs = [f["levels"][i]["fp32_val_acc"] for f in results["folds"]]
        effs = [f["levels"][i]["effective_param_sparsity"]
                for f in results["folds"]]
        lv_agg.append({"target": target,
                       "effective_param_sparsity": float(np.mean(effs)),
                       "fp32_val_acc_mean": float(np.mean(accs)),
                       "fp32_val_acc_ci95": ci95(float(np.mean(accs)),
                                                 n)})
    results["levels_pooled"] = lv_agg

    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {OUT_JSON}  ({time.time() - t0:.0f}s total)")

    # markdown table for docs/ACCURACY.md
    print(f"\n| stage | pooled accuracy (n={n}) |")
    print("|---|---|")
    s = summary
    print(f"| fp32 dense | {s['fp32_dense']['acc']:.2%} "
          f"± {s['fp32_dense']['ci95']:.2%} |")
    print(f"| INT8 PTQ of dense | {s['int8_of_dense']['acc']:.2%} "
          f"± {s['int8_of_dense']['ci95']:.2%} |")
    for lv in lv_agg:
        print(f"| fp32 pruned @{lv['target']:.0%} "
              f"(eff {lv['effective_param_sparsity']:.1%}) "
              f"| {lv['fp32_val_acc_mean']:.2%} |")
    print(f"| INT8 PTQ of pruned | {s['int8_of_pruned90']['acc']:.2%} "
          f"± {s['int8_of_pruned90']['ci95']:.2%} |")
    d = s["ptq_dense_paired_delta"]
    print(f"\npaired fp32->INT8 delta (dense): {d['delta']:+.2%} "
          f"± {d['ci95']:.2%}")
    d = s["ptq_pruned_paired_delta"]
    print(f"paired fp32->INT8 delta (pruned): {d['delta']:+.2%} "
          f"± {d['ci95']:.2%}")
    d = s["qat_pruned_paired_delta"]
    print(f"paired fp32->INT8 delta (pruned, QAT): {d['delta']:+.2%} "
          f"± {d['ci95']:.2%}")


if __name__ == "__main__":
    main()
