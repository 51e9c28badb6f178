"""Paged-KV serving throughput at long contexts (real TPU).

Measures decode tok/s of the paged engine at several context lengths —
the fixed-slot engine's typical config serves 48-64 positions; the
paged engine is measured at 4-8x that on the same model (bigger
position table, same weights otherwise).

Prints one line per config; paste the table into README.md.

Run: python tools/paged_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(max_len: int, prompt_len: int, n_new: int, slots: int = 4,
            page: int = 32, chunk: int = 16):
    import jax
    from resnet_accel_tpu.models.lm import TransformerLMInt8
    from resnet_accel_tpu.runtime.paged import PagedKVBatcher

    model = TransformerLMInt8.from_random(
        seed=0, vocab=256, d_model=256, n_heads=8, n_layers=4,
        max_len=max_len, sparsity=0.5)
    rng = np.random.default_rng(1)
    scales = model.calibrate(rng.integers(0, 256, 32))
    pool = slots * (-(-(prompt_len + n_new) // page)) + 1
    b = PagedKVBatcher(model, scales, slots=slots, page=page,
                       pool_pages=pool, chunk=chunk)

    def load():
        rids = []
        for s in range(slots):
            p = rng.integers(0, 256, prompt_len).tolist()
            rids.append(b.submit(p, n_new))
        return rids

    # warm-up run compiles the chunk program
    load()
    b.run()
    # timed run
    rids = load()
    t0 = time.perf_counter()
    res = b.run()
    dt = time.perf_counter() - t0
    toks = sum(len(res[r]) for r in rids)
    micro = b.micro_steps
    return toks / dt, toks, dt, micro


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    print(f"{'ctx':>6} {'prompt':>7} {'new':>5} {'tok/s':>9} "
          f"{'wall s':>7}")
    for max_len, prompt, n_new in [(64, 24, 32), (256, 128, 96),
                                   (512, 384, 96)]:
        tps, toks, dt, micro = measure(max_len, prompt, n_new)
        print(f"{max_len:6d} {prompt:7d} {n_new:5d} {tps:9.1f} "
              f"{dt:7.2f}")


if __name__ == "__main__":
    main()
