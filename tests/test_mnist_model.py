"""MNIST CNN end-to-end: TPU path vs golden, and accuracy vs reference logits.

This is the TPU rebuild of the reference's primary e2e verification
(hw/sim/test_mnist_bsr.cpp + verify_rtl.py): same real artifacts, same
golden comparison, tolerance 0 on the INT8 pipeline.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from resnet_accel_tpu.models.mnist_cnn import (
    MNISTCNNInt8,
    MNIST_MEAN,
    MNIST_STD,
    make_forward,
    forward_golden,
)

from conftest import requires_reference_data, REFERENCE_DATA

GOLDEN_INPUTS = "/root/reference/sw/golden/mnist_inputs.npy"
GOLDEN_LOGITS = "/root/reference/sw/golden/mnist_logits_fp32.npy"


def load_model_and_inputs(n=8):
    imgs = np.load(GOLDEN_INPUTS)[:n]
    model = MNISTCNNInt8.from_int8_dir(
        os.path.join(REFERENCE_DATA, "int8"), np.load(GOLDEN_INPUTS))
    x = imgs.astype(np.float32) / 255.0 if imgs.max() > 4.0 \
        else imgs.astype(np.float32)
    x = ((x - MNIST_MEAN) / MNIST_STD).reshape(-1, 1, 28, 28)
    return model, x


@requires_reference_data
@pytest.mark.skipif(not os.path.isfile(GOLDEN_INPUTS),
                    reason="golden inputs missing")
class TestMNISTEndToEnd:
    def test_tpu_path_bit_exact_vs_golden(self):
        model, x = load_model_and_inputs(n=4)
        params = model.as_device_params()
        fwd = make_forward(model, use_pallas=True)
        logits_tpu = np.asarray(fwd(params, jnp.asarray(x)))
        logits_gold = forward_golden(model, x)
        # INT8 pipeline must agree exactly; final dequant is the same f32
        # multiply on both sides -> bitwise equal logits.
        np.testing.assert_array_equal(logits_tpu, logits_gold)

    def test_xla_path_matches_pallas_path(self):
        model, x = load_model_and_inputs(n=4)
        params = model.as_device_params()
        a = np.asarray(make_forward(model, use_pallas=True)(
            params, jnp.asarray(x)))
        b = np.asarray(make_forward(model, use_pallas=False)(
            params, jnp.asarray(x)))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.skipif(not os.path.isfile(GOLDEN_LOGITS),
                        reason="golden logits missing")
    def test_int8_predictions_match_fp32_reference(self):
        # North-star metric: bit-exact match rate vs golden + accuracy
        # parity with the FP32 logits the reference shipped.
        model, x = load_model_and_inputs(n=32)
        params = model.as_device_params()
        fwd = make_forward(model, use_pallas=True)
        logits = np.asarray(fwd(params, jnp.asarray(x)))
        ref = np.load(GOLDEN_LOGITS)[:32]
        match = (logits.argmax(1) == ref.argmax(1)).mean()
        assert match >= 0.9, f"argmax match rate {match:.2%}"

    def test_batch_invariance(self):
        # Batched inference must equal per-sample inference (the reference
        # is batch-1 only; batching is a TPU capability extension).
        model, x = load_model_and_inputs(n=4)
        params = model.as_device_params()
        fwd = make_forward(model, use_pallas=True)
        full = np.asarray(fwd(params, jnp.asarray(x)))
        singles = np.concatenate([
            np.asarray(fwd(params, jnp.asarray(x[i:i + 1])))
            for i in range(4)])
        np.testing.assert_array_equal(full, singles)
