"""The complete sparse pipeline, end to end:

train -> progressive block pruning -> per-channel INT8 quantize -> BSR
export (reference-compatible artifacts) -> reload -> sparse INT8 serving
through the zero-skip kernel, accuracy-checked.

This is the whole ACCEL-v1 flow (SURVEY §3.1 + §3.2) in one test.
"""

import os

import numpy as np
import pytest

from resnet_accel_tpu.models.mnist_cnn import (
    MNISTCNNInt8, make_forward, forward_golden)
from resnet_accel_tpu.quant import quantize_symmetric_per_channel
from resnet_accel_tpu.runtime import InferenceEngine, preprocess_mnist
from resnet_accel_tpu.sparse import (
    build_bsr_int8_direct, save_layer_dir, load_layer_dir)
from resnet_accel_tpu.train import (
    BlockCfg, progressive_prune, sparsity_of_masks, train_mnist)
from resnet_accel_tpu.utils.mnist_data import load_mnist_split

MNIST_RAW = "/root/reference/data/MNIST/raw"
has_mnist = os.path.isdir(MNIST_RAW)


@pytest.mark.skipif(not has_mnist, reason="MNIST raw files not mounted")
class TestFullSparsePipeline:
    @pytest.fixture(scope="class")
    def pipeline(self, tmp_path_factory):
        imgs, labels = load_mnist_split(MNIST_RAW, "t10k")
        imgs, labels = imgs[:2000], labels[:2000]

        # 1. train dense
        res = train_mnist(imgs, labels, epochs=2, batch_size=64, seed=0)
        dense_acc = res.best_acc

        # 2. progressive block pruning 50 -> 70% with fine-tune
        cfgs = {"fc1.weight": BlockCfg(128, 128, 0.05)}

        def finetune(params, mask_fn, reg_fn):
            r = train_mnist(imgs, labels, epochs=1, batch_size=64,
                            seed=1, mask_fn=mask_fn, reg_fn=reg_fn,
                            params=params)
            return r.params

        pruned, masks = progressive_prune(res.params, finetune, cfgs,
                                          schedule=[0.5, 0.7])

        # 3. quantize per-channel INT8
        weights, scales, biases = {}, {}, {}
        for layer in ("conv1", "conv2", "fc1", "fc2"):
            w = pruned[f"{layer}.weight"]
            q, sc = quantize_symmetric_per_channel(w, axis=0)
            weights[layer], scales[layer] = q, sc
            biases[layer] = pruned[f"{layer}.bias"]

        # 4. export fc1 to a reference-format BSR artifact + reload
        art = tmp_path_factory.mktemp("bsr") / "fc1"
        bsr = build_bsr_int8_direct(weights["fc1"], 128)
        save_layer_dir(bsr, str(art), "fc1")
        reloaded = load_layer_dir(str(art))
        np.testing.assert_array_equal(reloaded.to_dense(), weights["fc1"])

        # 5. build the INT8 model (calibrated on training images) and
        #    attach the zero-skip stream
        x = imgs[:64].astype(np.float32) / 255.0
        from resnet_accel_tpu.models.mnist_cnn import (
            MNIST_MEAN, MNIST_STD, _calibrate_act_scales)
        xn = ((x - MNIST_MEAN) / MNIST_STD).reshape(-1, 1, 28, 28)
        act_scales = _calibrate_act_scales(xn, weights, scales, biases)
        model = MNISTCNNInt8.from_arrays(weights, scales, biases,
                                         act_scales)
        sparse_model = model.with_fc1_bsr(block=128)
        return (imgs, labels, dense_acc, masks, model, sparse_model)

    def test_pruning_reached_target(self, pipeline):
        _, _, _, masks, _, _ = pipeline
        assert 0.65 <= sparsity_of_masks(masks) <= 0.75

    def test_sparse_weights_have_zero_blocks(self, pipeline):
        *_, model, sparse_model = pipeline
        rep = sparse_model.sparsity_report()
        assert rep["fc1"] >= 0.6, rep

    def test_sparse_serving_matches_dense_serving(self, pipeline):
        imgs, _, _, _, model, sparse_model = pipeline
        x = preprocess_mnist(imgs[:32])
        import jax.numpy as jnp
        dense = np.asarray(make_forward(model, use_pallas=True)(
            model.as_device_params(), jnp.asarray(x)))
        sparse = np.asarray(make_forward(sparse_model, use_pallas=True)(
            sparse_model.as_device_params(), jnp.asarray(x)))
        np.testing.assert_array_equal(sparse, dense)

    def test_sparse_int8_accuracy(self, pipeline):
        imgs, labels, dense_acc, _, _, sparse_model = pipeline
        eng = InferenceEngine(sparse_model, make_forward, backend="cpu")
        acc = eng.verify_accuracy(preprocess_mnist(imgs[:500]),
                                  labels[:500])
        # 70%-sparse INT8 model should stay within a few points of the
        # dense FP32 training accuracy on this subset.
        assert acc >= dense_acc - 0.08, (acc, dense_acc)

    def test_golden_path_agrees(self, pipeline):
        imgs, _, _, _, _, sparse_model = pipeline
        x = preprocess_mnist(imgs[:4])
        import jax.numpy as jnp
        got = np.asarray(make_forward(sparse_model, use_pallas=True)(
            sparse_model.as_device_params(), jnp.asarray(x)))
        exp = forward_golden(sparse_model, x)
        np.testing.assert_array_equal(got, exp)
