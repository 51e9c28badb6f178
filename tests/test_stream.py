"""Streaming inference: native BatchLoader -> InferenceEngine.stream.

The loader quantizes on the host with the model's input scale, so the
streamed int8 path must produce the same logits as run_inference on the
equivalently preprocessed fp32 batch (which quantizes on device).
"""

import numpy as np
import pytest

from resnet_accel_tpu import native
from resnet_accel_tpu.models.mnist_cnn import (
    MNIST_MEAN,
    MNIST_STD,
    MNISTCNNInt8,
    make_forward,
)
from resnet_accel_tpu.runtime import InferenceEngine

from conftest import requires_reference_data, REFERENCE_DATA

needs_native = pytest.mark.skipif(
    not native.is_available(),
    reason="native library not built (make -C native)")

GOLDEN_INPUTS = "/root/reference/sw/golden/mnist_inputs.npy"


@pytest.fixture(scope="module")
def engine():
    import os
    calib = np.load(GOLDEN_INPUTS)
    model = MNISTCNNInt8.from_int8_dir(
        os.path.join(REFERENCE_DATA, "int8"), calib)
    return InferenceEngine(model, make_forward, backend="cpu")


@needs_native
@requires_reference_data
class TestStream:
    def test_stream_matches_fp32_path(self, engine):
        rng = np.random.default_rng(0)
        imgs_u8 = rng.integers(0, 256, (12, 1, 28, 28)).astype(np.uint8)
        labels = rng.integers(0, 10, 12).astype(np.int32)
        s0 = engine.model.act_scales[0]
        with native.BatchLoader(
                imgs_u8, labels, batch=4, mean=[MNIST_MEAN],
                std=[MNIST_STD], quant_scale=s0, shuffle=False,
                n_threads=2, depth=2) as ld:
            res = engine.stream(ld, n_batches=3)
        assert res.logits.shape == (12, 10)
        np.testing.assert_array_equal(res.labels, labels)
        assert res.images_per_s > 0

        x = ((imgs_u8.astype(np.float32) / 255.0) - MNIST_MEAN) \
            / MNIST_STD
        ref = engine.run_inference(x)
        np.testing.assert_allclose(res.logits, ref.logits,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(res.predictions, ref.predictions)

    def test_stream_without_labels(self, engine):
        rng = np.random.default_rng(1)
        imgs_u8 = rng.integers(0, 256, (8, 1, 28, 28)).astype(np.uint8)
        s0 = engine.model.act_scales[0]
        with native.BatchLoader(
                imgs_u8, None, batch=4, mean=[MNIST_MEAN],
                std=[MNIST_STD], quant_scale=s0, shuffle=False,
                n_threads=1, depth=2) as ld:
            res = engine.stream(ld, n_batches=2)
        assert res.labels is None
        with pytest.raises(ValueError, match="without labels"):
            _ = res.accuracy

    def test_single_batch_stream(self, engine):
        rng = np.random.default_rng(2)
        imgs_u8 = rng.integers(0, 256, (4, 1, 28, 28)).astype(np.uint8)
        s0 = engine.model.act_scales[0]
        with native.BatchLoader(
                imgs_u8, np.arange(4, dtype=np.int32), batch=4,
                mean=[MNIST_MEAN], std=[MNIST_STD], quant_scale=s0,
                shuffle=False) as ld:
            res = engine.stream(ld, n_batches=1)
        assert res.logits.shape == (4, 10)
        assert res.images_per_s > 0

    def test_loader_rejects_zero_std(self):
        imgs = np.zeros((4, 1, 2, 2), np.uint8)
        with pytest.raises(ValueError):
            native.BatchLoader(imgs, None, batch=2, mean=[0.5],
                               std=[0.0], quant_scale=0.1)
