"""Int8-KV quality measured where it can actually fail.

docs/SERVING.md's earlier evidence for ``kv_dtype="int8"`` was token
agreement on one greedy short-context workload.  This measures the
regimes users actually serve, on the corpus-trained serving-config LM
(4L d512 byte LM, tools/lm_corpus.py):

1. Held-out bits/byte THROUGH the paged engine (PagedKVBatcher.score:
   the exact paged gather/scatter + quantized pages arithmetic) at
   ctx 128 / 512 / 768, fp32 KV vs int8 KV, plus mean |delta log-prob|.
2. Greedy token agreement at ctx 512 prompts (128 new tokens).
3. SAMPLED streams (temperature 0.8, top-k 50) across >= 10 seeds with
   identical PRNG chains: tokens agree until one logit wiggle flips a
   categorical draw — reports per-seed first-divergence and agreement.

Writes docs/kv8_quality.json; prints the table for docs/SERVING.md.

Run: python tools/kv8_quality.py    (tunneled TPU, ~10-20 min)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "kv8_quality.json")

MAX_LEN = 1024
CTXS = (128, 512, 768)
N_WINDOWS = 12          # held-out windows per ctx
GEN_PROMPT, GEN_NEW = 512, 128
SAMP_PROMPT, SAMP_NEW = 256, 64
SEEDS = 12
TEMP, TOP_K = 0.8, 50


def engines(model, scales):
    from resnet_accel_tpu.runtime.paged import PagedKVBatcher

    def mk(kv, temp=0.0):
        return PagedKVBatcher(
            model, scales, slots=4, page=16, pool_pages=260,
            chunk=16, kv_dtype=kv, temperature=temp,
            top_k=TOP_K if temp > 0 else None)
    return mk


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from tools.lm_corpus import corpus_bytes, train_corpus_lm

    corpus = corpus_bytes()
    model, scales, heldout = train_corpus_lm(
        corpus, max_len=MAX_LEN, holdout_frac=0.1)
    mk = engines(model, scales)
    results = {"model": "4L d512 h8 byte LM (serving config), "
                        f"trained on {len(corpus) - len(heldout)} corpus "
                        f"bytes, held-out {len(heldout)}",
               "ppl": [], "greedy": {}, "sampled": {}}
    t0 = time.time()

    # ---- 1. held-out bits/byte through the paged engine ------------------
    rng = np.random.default_rng(0)
    for ctx in CTXS:
        offs = rng.integers(0, len(heldout) - ctx - 1, N_WINDOWS)
        seqs = [heldout[o:o + ctx].tolist() for o in offs]
        lp_fp = mk("fp32").score(seqs)
        lp_q8 = mk("int8").score(seqs)
        cat_fp = np.concatenate(lp_fp)
        cat_q8 = np.concatenate(lp_q8)
        bpb_fp = float(-cat_fp.mean() / np.log(2))
        bpb_q8 = float(-cat_q8.mean() / np.log(2))
        row = {"ctx": int(ctx), "tokens": int(cat_fp.size),
               "bpb_fp32_kv": bpb_fp, "bpb_int8_kv": bpb_q8,
               "delta_bpb": bpb_q8 - bpb_fp,
               "mean_abs_dlogp": float(np.abs(cat_fp - cat_q8).mean())}
        results["ppl"].append(row)
        print(f"ctx {ctx:4d}: bpb fp32-KV {bpb_fp:.4f} int8-KV "
              f"{bpb_q8:.4f} (delta {row['delta_bpb']:+.4f}, "
              f"mean|dlogp| {row['mean_abs_dlogp']:.4f}) "
              f"[{time.time()-t0:.0f}s]", flush=True)

    # ---- 2. greedy agreement at long context ------------------------------
    offs = rng.integers(0, len(heldout) - GEN_PROMPT - 1, 4)
    prompts = [heldout[o:o + GEN_PROMPT].tolist() for o in offs]
    e_fp, e_q8 = mk("fp32"), mk("int8")
    r_fp = [e_fp.submit(p, GEN_NEW) for p in prompts]
    r_q8 = [e_q8.submit(p, GEN_NEW) for p in prompts]
    o_fp, o_q8 = e_fp.run(), e_q8.run()
    agree, total, first_div = 0, 0, []
    for a, b in zip(r_fp, r_q8):
        ta, tb = o_fp[a], o_q8[b]
        same = [x == y for x, y in zip(ta, tb)]
        agree += sum(same)
        total += len(same)
        first_div.append(same.index(False) if False in same
                         else len(same))
    results["greedy"] = {
        "prompt": GEN_PROMPT, "new": GEN_NEW, "streams": len(prompts),
        "agreement": agree / total, "first_divergence": first_div}
    print(f"greedy ctx {GEN_PROMPT}+{GEN_NEW}: agreement "
          f"{agree}/{total} first-div {first_div} "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # ---- 3. sampled streams, identical PRNG chains ------------------------
    offs = rng.integers(0, len(heldout) - SAMP_PROMPT - 1, SEEDS)
    agree, total, first_div = 0, 0, []
    for s in range(SEEDS):
        p = heldout[offs[s]:offs[s] + SAMP_PROMPT].tolist()
        e_fp, e_q8 = mk("fp32", TEMP), mk("int8", TEMP)
        ra = e_fp.submit(p, SAMP_NEW, seed=1000 + s)
        rb = e_q8.submit(p, SAMP_NEW, seed=1000 + s)
        ta, tb = e_fp.run()[ra], e_q8.run()[rb]
        same = [x == y for x, y in zip(ta, tb)]
        agree += sum(same)
        total += len(same)
        first_div.append(same.index(False) if False in same
                         else len(same))
    results["sampled"] = {
        "temperature": TEMP, "top_k": TOP_K, "prompt": SAMP_PROMPT,
        "new": SAMP_NEW, "seeds": SEEDS, "agreement": agree / total,
        "first_divergence": first_div,
        "note": "identical PRNG chains; tokens agree until one logit "
                "wiggle flips a categorical draw, then trajectories "
                "separate permanently — first_divergence is the "
                "operative statistic"}
    print(f"sampled T={TEMP} {SEEDS} seeds: agreement {agree}/{total} "
          f"first-div {sorted(first_div)} [{time.time()-t0:.0f}s]",
          flush=True)

    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
