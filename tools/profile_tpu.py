"""Measured per-layer ResNet-family profile on the real chip.

    python tools/profile_tpu.py [batch] [depth]

Prints the runtime.xprof measured layer table (true per-HLO device
times attributed to named_scope layers) next to the analytic roofline
table for comparison.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from resnet_accel_tpu.models import resnet18 as r18  # noqa: E402
from resnet_accel_tpu.runtime import xprof  # noqa: E402
from resnet_accel_tpu.runtime.profile import (  # noqa: E402
    profile_resnet18, profile_table)


def main(batch: int = 64, depth: int = 18) -> None:
    from resnet_accel_tpu.models.resnet import (init_resnet_fp32,
                                                quantize_resnet)
    rng = np.random.default_rng(0)
    params_fp32 = init_resnet_fp32(depth=depth, seed=0,
                                   small_input=False)
    calib = rng.normal(0, 1, (8, 3, 224, 224)).astype(np.float32)
    model = quantize_resnet(params_fp32, calib, depth=depth,
                            small_input=False)
    params = model.as_device_params()
    fwd = r18.make_forward(model)
    x = jnp.asarray(rng.normal(0, 1, (batch, 3, 224, 224)),
                    jnp.float32)

    agg, ops = xprof.profile_layers(lambda p, a: fwd(p, a), params, x)
    print("== measured (xprof device trace) ==")
    print(xprof.layer_table(agg))
    total = sum(agg.values())
    print(f"\nmeasured device total: {total * 1e6:.0f} us "
          f"-> {batch / total:.0f} img/s")
    print("\n== analytic roofline (runtime.profile) ==")
    print(profile_table(profile_resnet18(model, batch=batch,
                                         measured_latency_s=total)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 18)
