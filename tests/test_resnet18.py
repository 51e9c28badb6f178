"""ResNet-18 INT8 end-to-end: quantize -> TPU forward vs golden, bit-exact.

The reference's resnet_inference is a stub; this verifies the TPU rebuild
actually runs the full 21-layer network with fused conv-BN-ReLU-requant,
residual adds, downsample paths, pooling and FC.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from resnet_accel_tpu.models.resnet18 import (
    init_resnet18_fp32,
    fold_bn,
    quantize_resnet18,
    make_forward,
    forward_golden,
    _float_forward_taps,
)


@pytest.fixture(scope="module")
def cifar_model():
    params = init_resnet18_fp32(seed=0, num_classes=10, small_input=True)
    rng = np.random.default_rng(1)
    calib = rng.normal(0, 1, (4, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet18(params, calib, num_classes=10,
                              small_input=True)
    return params, calib, model


class TestFoldBN:
    def test_fold_matches_sequential(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
        gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
        beta = rng.normal(size=8).astype(np.float32)
        mean = rng.normal(size=8).astype(np.float32)
        var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
        wf, bf = fold_bn(w, gamma, beta, mean, var)
        # conv(x; wf) + bf == BN(conv(x; w)) for a random input
        x = rng.normal(size=(4 * 9,)).astype(np.float32)
        patch = x.reshape(4, 3, 3)
        y_raw = (w.reshape(8, -1) @ x)
        y_bn = gamma * (y_raw - mean) / np.sqrt(var + 1e-5) + beta
        y_fold = wf.reshape(8, -1) @ x + bf
        np.testing.assert_allclose(y_fold, y_bn, rtol=1e-5, atol=1e-5)


class TestQuantize:
    def test_structure(self, cifar_model):
        _, _, model = cifar_model
        assert len(model.blocks) == 8
        downs = [b.downsample is not None for b in model.blocks]
        assert downs == [False, False, True, False, True, False, True,
                         False]
        assert model.fc_w.shape == (10, 512)
        for blk in model.blocks:
            assert blk.conv1.relu and not blk.conv2.relu

    def test_percentile_calibration_tightens_scales(self, cifar_model):
        params, calib, model = cifar_model
        clipped = quantize_resnet18(params, calib, num_classes=10,
                                    small_input=True,
                                    calib_percentile=99.0)
        # p100 == abs-max (same scales as the default path)
        p100 = quantize_resnet18(params, calib, num_classes=10,
                                 small_input=True,
                                 calib_percentile=100.0)
        np.testing.assert_allclose(
            np.asarray(p100.stem.factors),
            np.asarray(model.stem.factors), rtol=1e-6)
        # p99 clips: every requant factor scales DOWN or stays — output
        # scale shrinks, so at least one layer's factors must differ
        assert not np.allclose(np.asarray(clipped.stem.factors),
                               np.asarray(model.stem.factors))
        # and the clipped model still predicts like the unclipped one
        rng = np.random.default_rng(7)
        x = rng.normal(0, 1, (8, 3, 32, 32)).astype(np.float32)
        import jax
        with jax.default_device(jax.devices("cpu")[0]):
            a = np.asarray(make_forward(model, use_pallas=False)(
                model.as_device_params(), jnp.asarray(x))).argmax(-1)
            b = np.asarray(make_forward(clipped, use_pallas=False)(
                clipped.as_device_params(), jnp.asarray(x))).argmax(-1)
        assert (a == b).mean() >= 0.75

    def test_int8_accuracy_vs_float(self, cifar_model):
        params, calib, model = cifar_model
        import jax
        with jax.default_device(jax.devices("cpu")[0]):
            # Build the same folded float model for reference predictions.
            folded = {}
            from resnet_accel_tpu.models.resnet18 import STAGES
            def fold(cn, bn):
                wf, bf = fold_bn(params[f"{cn}.weight"],
                                 params[f"{bn}.weight"],
                                 params[f"{bn}.bias"],
                                 params[f"{bn}.running_mean"],
                                 params[f"{bn}.running_var"])
                folded[cn] = wf
                folded[cn + ".bias"] = bf
            fold("conv1", "bn1")
            for si, (oc, nb, _) in enumerate(STAGES, start=1):
                for b in range(nb):
                    base = f"layer{si}.{b}"
                    fold(f"{base}.conv1", f"{base}.bn1")
                    fold(f"{base}.conv2", f"{base}.bn2")
                    if f"{base}.downsample.0.weight" in params:
                        fold(f"{base}.downsample.0", f"{base}.downsample.1")
            folded["fc.weight"] = params["fc.weight"]
            folded["fc.bias"] = params["fc.bias"]
            ref_logits, _ = _float_forward_taps(
                folded, jnp.asarray(calib), True)
            ref_logits = np.asarray(ref_logits)
        got = forward_golden(model, calib)
        # INT8 logits should correlate strongly with FP32 logits.
        corr = np.corrcoef(got.reshape(-1), ref_logits.reshape(-1))[0, 1]
        assert corr > 0.98, f"corr {corr}"


class TestEndToEnd:
    def test_tpu_bit_exact_vs_golden(self, cifar_model):
        _, _, model = cifar_model
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        params = model.as_device_params()
        fwd = make_forward(model, use_pallas=True)
        got = np.asarray(fwd(params, jnp.asarray(x)))
        exp = forward_golden(model, x)
        np.testing.assert_array_equal(got, exp)

    def test_xla_path_matches(self, cifar_model):
        _, _, model = cifar_model
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        params = model.as_device_params()
        a = np.asarray(make_forward(model, use_pallas=True)(
            params, jnp.asarray(x)))
        b = np.asarray(make_forward(model, use_pallas=False)(
            params, jnp.asarray(x)))
        np.testing.assert_array_equal(a, b)

    def test_conv_routes_bit_exact(self, cifar_model):
        # Every conv route (bf16 / nhwc / residual barrier) computes the
        # SAME function: logits must be bit-identical to the default
        # forward (the bf16 route's exactness argument is in ops/conv.py).
        _, _, model = cifar_model
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(0, 1, (2, 3, 32, 32)), jnp.float32)
        params = model.as_device_params()
        base = np.asarray(make_forward(model)(params, x))
        l1 = ["b0.c1", "b0.c2", "b1.c1", "b1.c2"]
        variants = [
            dict(residual_barrier=True),
            dict(conv_routes={k: "bf16" for k in l1}),
            dict(conv_routes={k: "nhwc" for k in l1}),
            dict(conv_routes={"stem": "bf16"}),
            dict(conv_routes=dict({k: "bf16" for k in l1}, stem="bf16"),
                 residual_barrier=True),
        ]
        for kw in variants:
            got = np.asarray(make_forward(model, **kw)(params, x))
            np.testing.assert_array_equal(got, base, err_msg=str(kw))

    def test_bf16_route_guards_large_k(self, cifar_model):
        # C_in*K*K > 1024 would overflow float32's integer-exact range:
        # the bf16 route must refuse (b2.c2 has C_in=128, K=3 -> 1152).
        _, _, model = cifar_model
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(0, 1, (2, 3, 32, 32)), jnp.float32)
        params = model.as_device_params()
        fwd = make_forward(model, conv_routes={"b2.c2": "bf16"})
        with pytest.raises(ValueError, match="bf16 conv route"):
            fwd(params, x)

    @pytest.mark.slow
    def test_imagenet_geometry_golden(self):
        # One sample through the full 224x224 network (numpy golden only;
        # slow). Verifies stem 7x7/2 + maxpool p1 + all stages run.
        params = init_resnet18_fp32(seed=5, num_classes=1000,
                                    small_input=False)
        rng = np.random.default_rng(6)
        calib = rng.normal(0, 1, (1, 3, 224, 224)).astype(np.float32)
        model = quantize_resnet18(params, calib, 1000, small_input=False)
        x = rng.normal(0, 1, (1, 3, 224, 224)).astype(np.float32)
        params_d = model.as_device_params()
        fwd = make_forward(model, use_pallas=False)
        got = np.asarray(fwd(params_d, jnp.asarray(x)))
        exp = forward_golden(model, x)
        np.testing.assert_array_equal(got, exp)


class TestInputLayoutCHWN:
    def test_chwn_matches_nchw_fused_geometry(self):
        """input_layout="CHWN" (batch-minor ingest + pad-free fused
        stem) produces bit-identical logits to the NCHW path at a
        fused-stem geometry (N%128==0, H%4==0)."""
        params = init_resnet18_fp32(seed=2, num_classes=10,
                                    small_input=False)
        rng = np.random.default_rng(3)
        calib = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
        model = quantize_resnet18(params, calib, 10, small_input=False)
        x = rng.normal(0, 1, (128, 3, 32, 32)).astype(np.float32)
        pd = model.as_device_params()
        a = np.asarray(make_forward(model, use_pallas=False)(
            pd, jnp.asarray(x)))
        b = np.asarray(make_forward(model, use_pallas=False,
                                    input_layout="CHWN")(
            pd, jnp.asarray(x.transpose(1, 2, 3, 0))))
        np.testing.assert_array_equal(a, b)

    def test_chwn_matches_nchw_fallback_geometry(self):
        """Non-fused geometries transpose back to NCHW internally."""
        params = init_resnet18_fp32(seed=2, num_classes=10,
                                    small_input=False)
        rng = np.random.default_rng(4)
        calib = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
        model = quantize_resnet18(params, calib, 10, small_input=False)
        x = rng.normal(0, 1, (4, 3, 32, 32)).astype(np.float32)
        pd = model.as_device_params()
        a = np.asarray(make_forward(model, use_pallas=False)(
            pd, jnp.asarray(x)))
        b = np.asarray(make_forward(model, use_pallas=False,
                                    input_layout="CHWN")(
            pd, jnp.asarray(x.transpose(1, 2, 3, 0))))
        np.testing.assert_array_equal(a, b)
