"""Quantization-aware training tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resnet_accel_tpu.models.mnist_cnn import make_forward
from resnet_accel_tpu.runtime import InferenceEngine, preprocess_mnist
from resnet_accel_tpu.train import train_mnist
from resnet_accel_tpu.train.qat import (
    export_qat,
    fake_quant,
    fake_quant_per_channel,
    qat_finetune,
)
from resnet_accel_tpu.utils.mnist_data import load_mnist_split

MNIST_RAW = "/root/reference/data/MNIST/raw"
has_mnist = os.path.isdir(MNIST_RAW)


class TestFakeQuant:
    def test_forward_is_quantize_dequantize(self):
        x = jnp.asarray([0.24, 0.26, -1.0], jnp.float32)
        out = np.asarray(fake_quant(x, jnp.float32(0.1)))
        np.testing.assert_allclose(out, [0.2, 0.3, -1.0], atol=1e-6)

    def test_gradient_is_straight_through(self):
        g = jax.grad(lambda v: fake_quant(v, jnp.float32(0.1)).sum())(
            jnp.asarray([0.24, 3.7], jnp.float32))
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])

    def test_per_channel_scales(self):
        w = jnp.asarray([[0.1, -0.1], [10.0, -10.0]], jnp.float32)
        out = np.asarray(fake_quant_per_channel(w))
        # each row quantized against its own absmax
        np.testing.assert_allclose(out, np.asarray(w), rtol=2e-2)


@pytest.mark.skipif(not has_mnist, reason="MNIST raw files not mounted")
class TestQATEndToEnd:
    def test_qat_recovers_or_matches_ptq(self):
        imgs, labels = load_mnist_split(MNIST_RAW, "t10k")
        imgs, labels = imgs[:1500], labels[:1500]
        # Baseline FP32 training.
        res = train_mnist(imgs, labels, epochs=2, batch_size=64, seed=0)
        # QAT fine-tune through the quantizer.
        qat = qat_finetune(imgs, labels, params=res.params, epochs=1,
                           batch_size=64, seed=1)
        model = export_qat(qat)
        eng = InferenceEngine(model, make_forward, backend="cpu",
                              use_pallas=False)
        x = preprocess_mnist(imgs[:500])
        acc = eng.verify_accuracy(x, labels[:500])
        # INT8 deployment of the QAT model stays near FP32 training acc.
        assert acc >= res.best_acc - 0.05, (acc, res.best_acc)
        # learned activation scales are sane
        assert all(v > 0 for v in qat.act_absmax.values())


class TestResNetQAT:
    """Quant-aware fine-tune of the ResNet trunk (train/qat.py ResNet
    section): frozen BN, per-channel weight fake-quant through the fold,
    fixed calibrated activation taps, mask preservation."""

    STAGES_TINY = ((8, 1, 1), (16, 1, 2))

    @pytest.fixture(scope="class")
    def setup(self):
        from resnet_accel_tpu.train.resnet18 import train_resnet18, \
            merge_params
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (96, 3, 16, 16)).astype(np.float32)
        y = (x[:, 0, :8, :8].mean(axis=(1, 2)) > 0).astype(np.int32)
        state = train_resnet18(
            x, y, epochs=2, batch_size=32, lr=0.02, seed=0,
            num_classes=2, small_input=True, stages=self.STAGES_TINY)
        flat = merge_params(
            {k: np.asarray(v) for k, v in state.params.items()},
            {k: np.asarray(v) for k, v in state.bn_state.items()})
        return x, y, flat

    def test_calibration_matches_quantizer(self, setup):
        from resnet_accel_tpu.models.resnet18 import quantize_resnet18
        from resnet_accel_tpu.train.qat import calibrate_resnet_act_scales
        x, y, flat = setup
        s_in, s_tap = calibrate_resnet_act_scales(
            flat, x[:64], small_input=True, stages=self.STAGES_TINY,
            batch_size=32, percentile=99.9)
        model = quantize_resnet18(
            flat, x[:64], num_classes=2, small_input=True,
            stages=self.STAGES_TINY, calib_batch_size=32,
            calib_percentile=99.9)
        assert s_in == pytest.approx(model.s_input, rel=1e-6)
        # block 0's input scale is the stem tap scale
        assert s_tap["stem"] == pytest.approx(model.blocks[0].s_in,
                                              rel=1e-6)
        assert s_tap["b0.out"] == pytest.approx(model.blocks[0].s_out,
                                                rel=1e-6)

    def test_qat_preserves_structure_and_masks(self, setup):
        from resnet_accel_tpu.train.qat import qat_finetune_resnet
        x, y, flat = setup
        # zero a block of layer2 conv1 and a mask_fn that re-applies it
        key = "layer2.0.conv1.weight"
        mask = np.ones_like(flat[key])
        mask[:4] = 0.0
        flat_m = dict(flat)
        flat_m[key] = flat[key] * mask

        def mask_fn(p):
            return {**p, key: p[key] * jnp.asarray(mask)}

        out = qat_finetune_resnet(
            flat_m, x, y, epochs=1, batch_size=32, lr=1e-3,
            small_input=True, stages=self.STAGES_TINY, mask_fn=mask_fn,
            calib_x=x[:64], calib_percentile=99.9)
        assert set(out.keys()) == set(flat.keys())
        for k in flat:
            assert out[k].shape == np.asarray(flat[k]).shape
            if k.endswith(".running_mean") or k.endswith(".running_var"):
                np.testing.assert_array_equal(out[k], flat[k]), k
        np.testing.assert_array_equal(out[key][:4], 0.0)
        # something actually trained
        assert not np.allclose(out["fc.weight"], flat["fc.weight"])

    def test_qat_shrinks_quantization_error(self, setup):
        """The deployed-INT8-vs-fp32 logit gap shrinks after QAT (the
        objective QAT optimizes); the QAT'd model still quantizes and
        serves through the standard pipeline."""
        from resnet_accel_tpu.models.resnet18 import (make_forward,
                                                      quantize_resnet18)
        from resnet_accel_tpu.models.resnet18 import _float_forward_taps
        from resnet_accel_tpu.models.resnet18 import fold_all_bn
        from resnet_accel_tpu.train.qat import qat_finetune_resnet
        x, y, flat = setup

        def int8_gap(f):
            model = quantize_resnet18(
                f, x[:64], num_classes=2, small_input=True,
                stages=self.STAGES_TINY, calib_batch_size=32,
                calib_percentile=99.9)
            fwd = make_forward(model, use_pallas=False, backend="cpu")
            params = model.as_device_params()
            logits_q = np.asarray(fwd(params, jnp.asarray(x[:64])))
            folded = fold_all_bn(f, stages=self.STAGES_TINY)
            logits_f, _ = _float_forward_taps(
                folded, jnp.asarray(x[:64]), True,
                stages=self.STAGES_TINY)
            return float(np.abs(logits_q - np.asarray(logits_f)).mean())

        gap_before = int8_gap(flat)
        out = qat_finetune_resnet(
            flat, x, y, epochs=2, batch_size=32, lr=1e-3,
            small_input=True, stages=self.STAGES_TINY,
            calib_x=x[:64], calib_percentile=99.9)
        gap_after = int8_gap(out)
        assert np.isfinite(gap_after)
        assert gap_after < gap_before * 1.25  # never blows the gap up
