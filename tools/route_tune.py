"""In-model route tuning for the ResNet-18 forward (real TPU).

The per-layer xprof profile (tools/profile_tpu.py, batch 128) puts 58%
of device time in the stem + 64-channel layer1 convs.  This tool
profiles FULL-MODEL variants (routes only change how a layer computes,
never what — every variant is asserted logit-identical to the default
forward first):

  base      today's defaults (stem_nm kernel, all-native int8 NCHW)
  barrier   residual_barrier=True (keep adds out of conv fusions)
  l1bf16    layer0/1 convs on the exact bf16 route
  l1nhwc    layer0/1 convs channel-minor
  stembf16  stem s2d conv on the exact bf16 route
  stemxla   stem_nm/wh off (XLA quantize + s2d composition)
  combos of the winners

Prints the measured per-layer totals (xprof device trace) per variant.
Run: python tools/route_tune.py [batch] [only-variants] [depth]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch: int = 128, depth: int = 18) -> None:
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from resnet_accel_tpu.models import resnet18 as r18
    from resnet_accel_tpu.runtime import xprof

    from resnet_accel_tpu.models.resnet import (init_resnet_fp32,
                                                quantize_resnet)
    rng = np.random.default_rng(0)
    params_fp32 = init_resnet_fp32(depth=depth, seed=0,
                                   small_input=False)
    calib = rng.normal(0, 1, (8, 3, 224, 224)).astype(np.float32)
    model = quantize_resnet(params_fp32, calib, depth=depth,
                            small_input=False)
    params = model.as_device_params()
    x = jnp.asarray(rng.normal(0, 1, (batch, 3, 224, 224)), jnp.float32)

    # first-stage (64-channel) conv prefixes, any depth/block type
    from resnet_accel_tpu.models.resnet18 import QBottleneck
    L1 = []
    for i, blk in enumerate(model.blocks):
        if blk.conv2.in_channels > 64:    # past the 64-ch stage
            break
        L1 += [f"b{i}.c1", f"b{i}.c2"]
        if isinstance(blk, QBottleneck):
            L1.append(f"b{i}.c3")
    all_variants = [
        ("base", {}),
        ("barrier", {"residual_barrier": True}),
        ("l1bf16", {"conv_routes": {k: "bf16" for k in L1}}),
        ("l1nhwc", {"conv_routes": {k: "nhwc" for k in L1}}),
        ("stemstacked", {"conv_routes": {"stem": "fused-stacked"}}),
        ("chwn", {"input_layout": "CHWN"}),
        ("nobm", {"bm_trunk": False}),
        ("bmblock", {"conv_routes": {"bm": "block"}}),
        ("bmstacked", {"conv_routes": {"bm": "stacked"}}),
        ("stembf16", {"conv_routes": {"stem": "bf16"}}),
        ("stemxla", {"stem_nm": False, "stem_wh": False}),
        ("stemwh", {"stem_nm": False}),
        ("l1bf16+barrier", {"conv_routes": {k: "bf16" for k in L1},
                            "residual_barrier": True}),
        ("stembf16+barrier", {"conv_routes": {"stem": "bf16"},
                              "residual_barrier": True}),
    ]
    # Bottleneck-family extras: every 1x1 conv whose C_in <= 1024 has an
    # exact bf16 reformulation (ops/conv.py range analysis), and the -50
    # profile puts its worst MFU exactly there (c3 expansions / ds).
    if any(isinstance(b, QBottleneck) for b in model.blocks):
        def ok(qc):
            return qc.in_channels * qc.kernel * qc.kernel <= 1024
        c3 = [f"b{i}.c3" for i, b in enumerate(model.blocks)
              if isinstance(b, QBottleneck) and ok(b.conv3)]
        ds = [f"b{i}.ds" for i, b in enumerate(model.blocks)
              if b.downsample is not None and ok(b.downsample)]
        c1 = [f"b{i}.c1" for i, b in enumerate(model.blocks)
              if isinstance(b, QBottleneck) and ok(b.conv1)]
        for name, keys in [("c3bf16", c3), ("dsbf16", ds),
                           ("c1bf16", c1),
                           ("c3+dsbf16", c3 + ds),
                           ("allbf16", c3 + ds + c1 + L1)]:
            all_variants.append(
                (name, {"conv_routes": {k: "bf16" for k in keys}}))
        all_variants.append(
            ("c3nhwc", {"conv_routes": {k: "nhwc" for k in c3}}))
        # Stage-level NHWC: route EVERY conv of the deepest stage(s)
        # channel-minor so the interior transposes cancel and only the
        # stage boundary pays one relayout — aimed at the measured
        # b13-15.c2 anomaly (3x3 512ch @ 7x7 runs 400 us in the -50
        # program vs 92 us for the identical shape inside -18).
        def stage_keys(min_c):
            ks = []
            for i, b in enumerate(model.blocks):
                if b.conv2.in_channels < min_c:
                    continue
                ks += [f"b{i}.c1", f"b{i}.c2", f"b{i}.c3"]
                if b.downsample is not None:
                    ks.append(f"b{i}.ds")
            return ks
        all_variants += [
            ("s4nhwc", {"conv_routes":
                        {k: "nhwc" for k in stage_keys(512)}}),
            ("s34nhwc", {"conv_routes":
                         {k: "nhwc" for k in stage_keys(256)}}),
            ("deepc2im2col", {"conv_routes": {
                f"b{i}.c2": "im2col"
                for i, b in enumerate(model.blocks)
                if b.conv2.in_channels >= 512}}),
            ("deepc2nhwc", {"conv_routes": {
                f"b{i}.c2": "nhwc"
                for i, b in enumerate(model.blocks)
                if b.conv2.in_channels >= 512}}),
            ("deepc2nhwcb", {"conv_routes": {
                f"b{i}.c2": "nhwcb"
                for i, b in enumerate(model.blocks)
                if b.conv2.in_channels >= 512}}),
            ("deepc2b", {"conv_routes": {
                f"b{i}.c2": "nativeb"
                for i, b in enumerate(model.blocks)
                if b.conv2.in_channels >= 512}}),
            ("s3c2nhwcb", {"conv_routes": {
                f"b{i}.c2": "nhwcb"
                for i, b in enumerate(model.blocks)
                if b.conv2.in_channels >= 256}}),
        ]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    variants = [(n, kw) for n, kw in all_variants
                if only is None or n in only or n == "base"]

    xc = jnp.asarray(np.asarray(x).transpose(1, 2, 3, 0))
    ref = None
    for name, kw in variants:
        try:
            fwd = r18.make_forward(model, **kw)
            xv = xc if kw.get("input_layout") == "CHWN" else x
            agg, _ = xprof.profile_layers(lambda p, a: fwd(p, a),
                                          params, xv)
            total = sum(agg.values())
            out = np.asarray(jax.jit(fwd)(params, xv))
        except Exception as e:  # keep sweeping past a broken variant
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        if ref is None:
            ref = out
            exact = True
        else:
            exact = bool(np.array_equal(out, ref))
        hot = sorted(agg.items(), key=lambda kv: -kv[1])[:5]
        hot_s = "  ".join(f"{k}={v * 1e6:.0f}" for k, v in hot)
        print(f"{name:16s} {total * 1e6:7.1f} us  "
              f"({batch / total:6.0f} img/s)  exact={exact}  [{hot_s}]",
              flush=True)
        assert exact, f"variant {name} is not bit-exact"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[3]) if len(sys.argv) > 3 else 18)
