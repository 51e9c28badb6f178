"""Chipless AOT compile check: catch Mosaic/VMEM regressions without a TPU.

Interpret-mode tests prove numerics but NOT that a kernel lowers and
fits on real hardware — the v1 pm kernel passed every hermetic test and
then died on-chip with a scoped-VMEM OOM.  This check compiles the hot
Pallas kernels and the flagship forward against a local libtpu v5e
topology (no chip, no tunnel) so lowering and VMEM budgets regress
loudly in CI.

Usage: python tools/aot_check.py          (~2-4 min on one CPU)
Skips (rc 0, message) when no local libtpu topology is available.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Never touch the tunnel: the sitecustomize-registered axon plugin would
# otherwise initialize on the first backends() call (hang or UNAVAILABLE
# when the tunnel is down).
from resnet_accel_tpu.runtime.backend import drop_tunnel_backend  # noqa: E402

drop_tunnel_backend()


def get_topology():
    from jax.experimental import topologies

    return topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1), num_slices=1)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import SingleDeviceSharding

    try:
        topo = get_topology()
    except Exception as e:  # no libtpu in this env — not a failure
        print(f"SKIP: no local TPU topology ({type(e).__name__}: {e})")
        return 0
    sh = SingleDeviceSharding(topo.devices[0])

    def spec(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    checks = []

    # --- pm pair-plane kernel chain at layer1 geometry ------------------
    from resnet_accel_tpu.ops import conv_pm
    N, C, H, W = 128, 64, 56, 56
    rng = np.random.default_rng(0)
    g = jnp.asarray(conv_pm.pack_g3_pair(
        rng.integers(-128, 128, (C, C * 9), dtype=np.int8), C))
    b = jnp.zeros((C,), jnp.int32)
    f = jnp.ones((C,), jnp.float32)

    def pm_block(xe, xo, re_, ro_):
        ye = conv_pm.conv3x3_pm2(xe, xo, g, b, f, n=N, relu=True)
        return conv_pm.conv3x3_pm2(
            ye[0], ye[1], g, b, f, n=N, relu=False, residual=(re_, ro_),
            res_scales=(0.0412, 0.0319, 0.0517))

    plane = spec((H // 2, C, W * N), jnp.int8)
    checks.append(("pm_block_56x56",
                   lambda: jax.jit(pm_block).lower(
                       plane, plane, plane, plane).compile()))

    # --- full flagship forward (pm trunk ON) at bench geometry ----------
    from resnet_accel_tpu.models.resnet18 import (
        init_resnet18_fp32, quantize_resnet18, make_forward)
    fp32 = init_resnet18_fp32(seed=0, num_classes=1000, small_input=False)
    calib = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
    model = quantize_resnet18(fp32, calib, 1000, small_input=False)
    params = model.as_device_params()
    pshapes = {k: spec(v.shape, v.dtype) for k, v in params.items()}
    x = spec((128, 3, 224, 224), jnp.float32)
    for pm in (False, True):
        fwd = make_forward(model, use_pallas=True, backend="tpu",
                           pm_trunk=pm)
        checks.append((f"resnet18_fwd_b128_pm={pm}",
                       lambda fwd=fwd: jax.jit(fwd).lower(
                           pshapes, x).compile()))

    # Row-stacked stem-kernel formulation (M=128/K=160 dots, deeper
    # ring mirror): compile the forward that routes through it.
    fwd_stk = make_forward(model, use_pallas=True, backend="tpu",
                           conv_routes={"stem": "fused-stacked"})
    checks.append(("resnet18_fwd_b128_stem_stacked",
                   lambda: jax.jit(fwd_stk).lower(pshapes, x).compile()))

    # Batch 32 disqualifies the NM stem's 128-lane gate, forcing the WH
    # stem kernel (ops/stem_pack._kernel_wh) — whose bitcast parity
    # split has NO hermetic execution coverage (interpret mode takes
    # the plain-composition early-return), so compile-check it here.
    fwd_wh = make_forward(model, use_pallas=True, backend="tpu")
    x32 = spec((32, 3, 224, 224), jnp.float32)
    checks.append(("resnet18_fwd_b32_whstem",
                   lambda: jax.jit(fwd_wh).lower(pshapes, x32).compile()))

    failed = 0
    for name, run in checks:
        try:
            run()
            print(f"PASS {name}", flush=True)
        except Exception as e:
            failed += 1
            print(f"FAIL {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
    if failed:
        print(f"{failed}/{len(checks)} AOT checks failed")
        return 1
    print(f"all {len(checks)} AOT checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
