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
