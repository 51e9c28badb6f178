"""On-chip benchmark: prompt-lookup speculative decoding vs vanilla
greedy decode (models/lm.py generate_speculative vs generate).

Real-text workload: byte-level prompts drawn from the reference's own
docs/source tree (the corpus class the serving engines target —
repetitive, so prompt-lookup acceptance is high).  Both paths are ONE
jitted program; the speedup measured here is pure device time: the
verify pass processes draft+1 tokens in batched GEMMs where vanilla
decode runs them as sequential single-token steps.

Run on the tunneled TPU:  python tools/spec_bench.py
Knobs: SPEC_DRAFT (default 7 here; model default 15), SPEC_NGRAM (3),
SPEC_TEMP (default 0 = greedy; > 0 benches speculative SAMPLING vs
sample() — outputs are distribution-exact rather than bit-equal, so
the per-prompt check becomes first-token key-parity).

MEASURED (tunneled v5e, 4L d512 INT8 byte LM trained 1500 steps on the
corpus, prompt 640, new 256, 4 prompts, 2026-08-19), all outputs
bit-identical to generate():

    draft=7  ngram=3   1.55x  (1.45-1.72x per prompt)
    draft=15 ngram=3   2.05x  <- model default
    draft=15 ngram=4   1.93x
    draft=31 ngram=3   1.96x
    random-weighted model (untrained): 0.94x — acceptance is a model
    property; the verify pass itself is nearly free (decode is
    weight-bandwidth-bound, 153->122 passes for 256 tokens).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    MAX_LEN = 1024
    PROMPT, N_NEW = 640, 256
    DRAFT = int(os.environ.get("SPEC_DRAFT", "7"))
    NGRAM = int(os.environ.get("SPEC_NGRAM", "3"))
    TEMP = float(os.environ.get("SPEC_TEMP", "0"))

    # Real text (reference md/py sources, byte tokens).  Speculative
    # decoding's acceptance rate is a property of the MODEL's output
    # distribution, so the subject must actually model the text: a
    # random-weighted LM measured 0.94x (125 verify passes for 256
    # tokens — its argmax stream ignores corpus patterns, so
    # prompt-lookup drafts rarely land).  Train briefly on-chip first
    # (tools/lm_corpus.py, the shared corpus-LM builder).
    from tools.lm_corpus import corpus_bytes, train_corpus_lm
    corpus = corpus_bytes()
    prompts = [corpus[o:o + PROMPT] for o in
               (11_000, 60_000, 130_000, 200_000)]
    model, scales, _ = train_corpus_lm(corpus, max_len=MAX_LEN)

    def timed(fn, *args, **kw):
        out = fn(*args, **kw)          # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        return out, time.perf_counter() - t0

    mode = f"sampled temp={TEMP}" if TEMP > 0 else "greedy"
    print(f"4L d512 INT8 byte LM (corpus-trained), prompt {PROMPT}, "
          f"new {N_NEW}, draft {DRAFT}, {mode}", flush=True)
    tot_v = tot_s = 0.0
    for i, p in enumerate(prompts):
        if TEMP > 0:
            key = jax.random.PRNGKey(i)
            exp, tv = timed(model.sample, p, N_NEW, scales, key,
                            temperature=TEMP, jit=True)
            (got, steps), ts = timed(
                model.generate_speculative, p, N_NEW, scales,
                draft=DRAFT, ngram=NGRAM, return_stats=True,
                temperature=TEMP, rng_key=key)
            # stochastic paths only share the prefill draw — the rest
            # is distribution-exact, not bit-equal (tested hermetically
            # in tests/test_spec_sampling.py)
            same = int(np.asarray(exp)[0]) == int(np.asarray(got)[0])
            label = "tok0-parity"
        else:
            exp, tv = timed(model.generate, p, N_NEW, scales, jit=True)
            (got, steps), ts = timed(
                model.generate_speculative, p, N_NEW, scales,
                draft=DRAFT, ngram=NGRAM, return_stats=True)
            same = np.array_equal(np.asarray(exp), np.asarray(got))
            label = "identical"
        tot_v += tv
        tot_s += ts
        print(f"  prompt[{i}]: vanilla {tv * 1e3:7.1f} ms  spec "
              f"{ts * 1e3:7.1f} ms  ({tv / ts:4.2f}x)  verify passes "
              f"{int(steps):3d}/{N_NEW}  {label}={same}", flush=True)
        if not same:
            raise SystemExit("speculative output diverged")
    print(f"TOTAL: vanilla {tot_v * 1e3:.1f} ms  spec {tot_s * 1e3:.1f}"
          f" ms  speedup {tot_v / tot_s:.2f}x "
          f"({N_NEW * len(prompts) / tot_s:.0f} tok/s single-stream)",
          flush=True)


if __name__ == "__main__":
    main()
