"""MNIST INT8 accuracy regression — the reference claims 98.7% INT8.

Full t10k on TPU measures 98.92% (see README).  This hermetic test checks
a 1000-image subset on the CPU software model stays >= 98%.
"""

import os

import numpy as np
import pytest

from resnet_accel_tpu.models.mnist_cnn import MNISTCNNInt8, make_forward
from resnet_accel_tpu.runtime import InferenceEngine, preprocess_mnist
from resnet_accel_tpu.utils.mnist_data import load_mnist_split

MNIST_RAW = "/root/reference/data/MNIST/raw"
INT8_DIR = "/root/reference/data/int8"
GOLDEN = "/root/reference/sw/golden/mnist_inputs.npy"

ready = (os.path.isdir(MNIST_RAW) and os.path.isdir(INT8_DIR)
         and os.path.isfile(GOLDEN))


@pytest.mark.skipif(not ready, reason="reference MNIST artifacts missing")
def test_int8_accuracy_subset():
    imgs, labels = load_mnist_split(MNIST_RAW, "t10k")
    imgs, labels = imgs[:1000], labels[:1000]
    model = MNISTCNNInt8.from_int8_dir(INT8_DIR, np.load(GOLDEN))
    # XLA op path on the CPU software model (Pallas interpret would be
    # needlessly slow for 1000 images; the paths are bit-identical).
    eng = InferenceEngine(model, make_forward, backend="cpu",
                          use_pallas=False)
    acc = eng.verify_accuracy(preprocess_mnist(imgs), labels)
    assert acc >= 0.98, f"INT8 accuracy {acc:.2%}"
