"""Quantization-aware training — fake-quant fine-tuning with STE.

Beyond-parity: the reference is PTQ-only (quantize.py post-training).
QAT fine-tunes the FP32 model THROUGH the INT8 quantizer so the weights
adapt to the grid, recovering accuracy lost to quantization:

- weights: per-output-channel symmetric fake-quant (the exact same scale
  formula the PTQ/inference path uses), gradients pass straight through
  (STE via stop_gradient).
- activations: per-tensor symmetric fake-quant at the same tap points
  the inference pipeline requantizes, with scales tracked by EMA over
  batch absmax (the calibrator's role, learned online).

``export_qat`` hands the tuned weights + learned activation scales
directly to models.mnist_cnn.MNISTCNNInt8.from_arrays — the deployed
INT8 model then matches what training optimized.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from resnet_accel_tpu.models.mnist_cnn import MNIST_MEAN, MNIST_STD
from resnet_accel_tpu.train.mnist import init_mnist_params

EMA = 0.99


def fake_quant(x, scale):
    """Quantize-dequantize with a straight-through gradient."""
    q = jnp.clip(jnp.rint(x / scale), -128, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_per_channel(w, axis: int = 0):
    """Per-output-channel symmetric fake-quant (PTQ scale formula)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    maxabs = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(maxabs / 127.0, 1e-12)
    return fake_quant(w, scale)


def _qat_forward(params, act_scales, x, train: bool):
    """MNIST forward with fake-quant at every inference tap.

    Returns (logits, observed absmax per tap) — the absmax feeds the EMA
    scale state exactly where inference requantizes.
    """
    obs = {}

    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, fake_quant_per_channel(w), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    def act_fq(name, v):
        obs[name] = jnp.max(jnp.abs(v))
        scale = jnp.maximum(act_scales[name] / 127.0, 1e-12)
        return fake_quant(v, scale)

    a = act_fq("x", x)
    a = jnp.maximum(conv(a, params["conv1.weight"],
                         params["conv1.bias"]), 0)
    a = act_fq("conv1", a)
    a = jnp.maximum(conv(a, params["conv2.weight"],
                         params["conv2.bias"]), 0)
    a = act_fq("conv2", a)
    N, C, H, W = a.shape
    a = a.reshape(N, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    a = a.reshape(N, -1)
    a = jnp.maximum(
        a @ fake_quant_per_channel(params["fc1.weight"]).T
        + params["fc1.bias"], 0)
    a = act_fq("fc1", a)
    logits = a @ fake_quant_per_channel(params["fc2.weight"]).T \
        + params["fc2.bias"]
    return logits, obs


TAPS = ("x", "conv1", "conv2", "fc1")


@dataclasses.dataclass
class QATResult:
    params: Dict[str, np.ndarray]
    act_absmax: Dict[str, float]     # EMA absmax per tap
    history: list


def qat_finetune(
    images_u8: np.ndarray,
    labels: np.ndarray,
    params: Optional[Dict[str, np.ndarray]] = None,
    epochs: int = 1,
    batch_size: int = 128,
    lr: float = 2e-4,
    seed: int = 0,
    mask_fn: Optional[Callable] = None,
) -> QATResult:
    """Fine-tune through the quantizer (optionally with sparsity masks)."""
    x = ((images_u8.astype(np.float32) / 255.0) - MNIST_MEAN) / MNIST_STD
    x = x.reshape(-1, 1, 28, 28)
    y = np.asarray(labels, np.int32)

    if params is None:
        params = init_mnist_params(seed)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    # EMA absmax state, initialized from the first batch.
    act_absmax = {t: jnp.float32(1.0) for t in TAPS}

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, scales, xb, yb):
        logits, obs = _qat_forward(p, scales, xb, True)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()
        return loss, obs

    @jax.jit
    def step(p, scales, s, xb, yb):
        (loss, obs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, scales, xb, yb)
        upd, s = opt.update(grads, s)
        p = optax.apply_updates(p, upd)
        scales = {t: EMA * scales[t] + (1 - EMA) * obs[t] for t in TAPS}
        return p, scales, s, loss

    rng = np.random.default_rng(seed)
    n = len(x)
    history = []
    # Warm the EMA from one forward pass.
    _, obs0 = jax.jit(
        lambda p, sc, xb: _qat_forward(p, sc, xb, False))(
        params, act_absmax, jnp.asarray(x[:batch_size]))
    act_absmax = {t: obs0[t] for t in TAPS}

    for epoch in range(epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i:i + batch_size]
            params, act_absmax, opt_state, loss = step(
                params, act_absmax, opt_state,
                jnp.asarray(x[idx]), jnp.asarray(y[idx]))
            if mask_fn is not None:
                params = mask_fn(params)
            losses.append(float(loss))
        history.append({"epoch": epoch, "loss": float(np.mean(losses))})

    return QATResult(
        params={k: np.asarray(v) for k, v in params.items()},
        act_absmax={t: float(act_absmax[t]) for t in TAPS},
        history=history)


def export_qat(result: QATResult):
    """Build the deployed INT8 model from a QAT result.

    Returns a models.mnist_cnn.MNISTCNNInt8 whose weights are quantized
    with the same per-channel scales QAT trained against and whose
    activation scales are the learned EMA values.
    """
    from resnet_accel_tpu.models.mnist_cnn import MNISTCNNInt8
    from resnet_accel_tpu.quant import quantize_symmetric_per_channel

    weights, scales, biases = {}, {}, {}
    for layer in ("conv1", "conv2", "fc1", "fc2"):
        q, sc = quantize_symmetric_per_channel(
            result.params[f"{layer}.weight"], axis=0)
        weights[layer], scales[layer] = q, sc
        biases[layer] = result.params[f"{layer}.bias"]
    act_scales = tuple(
        max(result.act_absmax[t] / 127.0, 1e-12) for t in TAPS)
    return MNISTCNNInt8.from_arrays(weights, scales, biases, act_scales)
