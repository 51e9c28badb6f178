"""Measured ResNet-family table: -18/-34/-50/-101/-152 on one chip.

For each depth at the throughput geometry (batch 128, ImageNet
224x224): chained-steady-state img/s (the bench.py methodology —
data-dependent fori_loop chain, 1-dispatch program subtracted, median
over interleaved pairs), single-dispatch xprof device total, MFU
(achieved int8 ops / platform peak), and the top time sinks so the
depth scaling of each cap (c3 joins, 64-ch stage, stem) is visible.

The reference only sketched the layer-table generalization beyond -18
(/root/reference/hw/sim/cpp/include/resnet_inference.hpp:121-133);
-18 and -50 got full measured treatment in rounds 3-4, this completes
the family (VERDICT r4 ask #5).

Run: python tools/family_bench.py [depths]   (tunneled TPU, ~20 min)
     depths default "18,34,50,101,152".
Writes docs/family_bench.json and prints the markdown table for
docs/ARCHITECTURE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("FAM_BATCH", "128"))
CHAIN = int(os.environ.get("FAM_CHAIN", "16"))
ITERS = int(os.environ.get("FAM_ITERS", "7"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "family_bench.json")


def bench_depth(depth: int):
    import jax
    import jax.numpy as jnp
    from resnet_accel_tpu.models import resnet18 as r18
    from resnet_accel_tpu.models.resnet import (init_resnet_fp32,
                                                quantize_resnet)
    from resnet_accel_tpu.runtime import xprof
    from resnet_accel_tpu.runtime.perf import (get_platform,
                                               median_pair_time)
    from resnet_accel_tpu.runtime.profile import profile_resnet18

    rng = np.random.default_rng(0)
    fp32 = init_resnet_fp32(depth=depth, seed=0, small_input=False)
    calib = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
    model = quantize_resnet(fp32, calib, depth=depth,
                            small_input=False)
    params = model.as_device_params()
    fwd = r18.make_forward(model, use_pallas=True)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 3, 224, 224)),
                    jnp.float32)

    # analytic MACs/img for MFU
    macs = sum(r.total_ops for r in
               profile_resnet18(model, batch=1).records) // 2

    def make_loop(n):
        @jax.jit
        def loop(x0):
            def body(i, carry):
                out = fwd(params, carry)
                return carry + out.sum().astype(carry.dtype) * 1e-30
            return jax.lax.fori_loop(0, n, body, x0)[0, 0, 0, 0]
        _ = np.asarray(loop(x))
        return loop

    l1, lc = make_loop(1), make_loop(CHAIN)
    per_batch = median_pair_time(l1, lc, x, CHAIN, ITERS)
    img_s = BATCH / per_batch

    agg, _ = xprof.profile_layers(lambda p, a: fwd(p, a), params, x)
    dev_total_us = sum(agg.values()) * 1e6
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:6]

    plat = get_platform()
    mfu = img_s * 2 * macs / plat.peak_int8_ops
    return {
        "depth": depth, "batch": BATCH,
        "img_per_s": round(img_s, 1),
        "xprof_device_us": round(dev_total_us, 1),
        "xprof_img_per_s": round(BATCH / (dev_total_us * 1e-6), 1),
        "gmacs_per_img": round(macs / 1e9, 3),
        "mfu_int8": round(mfu, 4),
        "top_scopes_us": {k: round(v * 1e6, 1) for k, v in top},
    }


def main():
    depths = [int(d) for d in
              (sys.argv[1] if len(sys.argv) > 1
               else "18,34,50,101,152").split(",")]
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    rows = []
    for d in depths:
        t0 = time.time()
        row = bench_depth(d)
        rows.append(row)
        print(f"[{time.time() - t0:6.0f}s] {row}", flush=True)

    with open(OUT, "w") as fh:
        json.dump({"batch": BATCH, "chain": CHAIN, "rows": rows},
                  fh, indent=1)
    print(f"wrote {OUT}\n")
    print("| depth | GMACs/img | img/s (chained) | xprof device µs "
          "| MFU (int8) | top sinks |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        sinks = ", ".join(f"{k} {v:.0f}" for k, v in
                          list(r["top_scopes_us"].items())[:3])
        print(f"| -{r['depth']} | {r['gmacs_per_img']} | "
              f"{r['img_per_s']:,.0f} | {r['xprof_device_us']:,.0f} | "
              f"{100 * r['mfu_int8']:.1f}% | {sinks} |")


if __name__ == "__main__":
    main()
