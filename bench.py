"""Headline benchmark: ResNet-18 INT8 images/sec/chip on real TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's projected ResNet-18 throughput of ~137 images/s
at 70% sparsity on its 14x14 FPGA array (BASELINE.md, DEEP_DIVE.md:302).
We run the same workload class — ResNet-18 INT8 inference, ImageNet
geometry — end to end (quantize -> jit -> batched forward) on one chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_IMAGES_PER_S = 137.0
BATCH = 256
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp
    from resnet_accel_tpu.models.resnet18 import (
        init_resnet18_fp32, quantize_resnet18, make_forward)

    fp32 = init_resnet18_fp32(seed=0, num_classes=1000, small_input=False)
    rng = np.random.default_rng(0)
    calib = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
    model = quantize_resnet18(fp32, calib, 1000, small_input=False)
    params = model.as_device_params()
    fwd = jax.jit(make_forward(model, use_pallas=True))

    x = jnp.asarray(
        rng.normal(0, 1, (BATCH, 3, 224, 224)).astype(np.float32))
    _ = np.asarray(fwd(params, x))  # compile + materialize

    # Average over ITERS dispatches, forcing full materialization each
    # time (np.asarray) so relay pipelining can't fake the clock; take
    # the best of 3 such averaged windows.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = np.asarray(fwd(params, x))
        best = min(best, (time.perf_counter() - t0) / ITERS)

    images_per_s = BATCH / best
    print(json.dumps({
        "metric": "resnet18_int8_images_per_sec_per_chip",
        "value": round(images_per_s, 1),
        "unit": "images/s",
        "vs_baseline": round(images_per_s / REFERENCE_IMAGES_PER_S, 2),
    }))


if __name__ == "__main__":
    # One retry guards against transient remote-compile/tunnel hiccups;
    # the driver records whatever single JSON line reaches stdout.
    try:
        main()
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        main()
