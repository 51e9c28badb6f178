"""Speculative decoding inside the paged engine: measured tok/s uplift
at serving batch sizes (real TPU).

The single-stream speculative path measured 2.05x (tools/spec_bench.py)
but never reached the engines that serve load; this measures
PagedKVBatcher(spec_draft=N) — batched draft+verify per slot, verify
windows spanning page boundaries — on the corpus-trained serving-config
LM (tools/lm_corpus.py) at 4 and 8 slots, greedy outputs asserted
IDENTICAL to the non-speculative engine per slot.

Run: python tools/paged_spec_bench.py   (tunneled TPU, ~10 min)
Knobs: PSB_DRAFTS (default "0,7,15"), PSB_SLOTS ("4,8"),
PSB_PROMPT (384), PSB_NEW (128).
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
    from resnet_accel_tpu.runtime.paged import PagedKVBatcher
    from tools.lm_corpus import corpus_bytes, train_corpus_lm

    drafts = [int(d) for d in
              os.environ.get("PSB_DRAFTS", "0,7,15").split(",")]
    slot_counts = [int(s) for s in
                   os.environ.get("PSB_SLOTS", "4,8").split(",")]
    PROMPT = int(os.environ.get("PSB_PROMPT", "384"))
    N_NEW = int(os.environ.get("PSB_NEW", "128"))

    corpus = corpus_bytes()
    model, scales, _ = train_corpus_lm(corpus, max_len=1024)

    def run_engine(slots, draft, prompts):
        need = -(-(PROMPT + N_NEW + max(draft, 0)) // 16)
        b = PagedKVBatcher(model, scales, slots=slots, page=16,
                           pool_pages=slots * need + 2, chunk=8,
                           spec_draft=draft)
        rids = [b.submit(p, N_NEW) for p in prompts]
        b.run()                      # warm-up compiles
        b2 = PagedKVBatcher(model, scales, slots=slots, page=16,
                            pool_pages=slots * need + 2, chunk=8,
                            spec_draft=draft)
        rids = [b2.submit(p, N_NEW) for p in prompts]
        t0 = time.perf_counter()
        res = b2.run()
        dt = time.perf_counter() - t0
        toks = sum(len(res[r]) for r in rids)
        return toks / dt, dt, [tuple(res[r]) for r in rids]

    print(f"{'slots':>5} {'draft':>5} {'tok/s':>9} {'wall s':>7} "
          f"{'vs draft=0':>10} {'identical':>9}")
    results = {}
    for slots in slot_counts:
        rng = np.random.default_rng(5)
        offs = rng.integers(0, len(corpus) - PROMPT - 1, slots)
        prompts = [corpus[o:o + PROMPT].tolist() for o in offs]
        base_tps, base_out = None, None
        for draft in drafts:
            tps, dt, outs = run_engine(slots, draft, prompts)
            if draft == 0:
                base_tps, base_out = tps, outs
                rel, ident = 1.0, True
            else:
                rel = tps / base_tps if base_tps else float("nan")
                ident = outs == base_out
            results[(slots, draft)] = (tps, rel, ident)
            print(f"{slots:5d} {draft:5d} {tps:9.1f} {dt:7.2f} "
                  f"{rel:9.2f}x {str(ident):>9}", flush=True)
            assert ident, (
                f"speculative outputs diverged at slots={slots} "
                f"draft={draft}")


if __name__ == "__main__":
    main()
