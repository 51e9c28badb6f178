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


# ==========================================================================
# ResNet-family QAT (quant-aware fine-tune of a trained / pruned trunk)
# ==========================================================================
#
# The reference stops at PTQ (sw/INT8 quantization/quantize_resnet18.py);
# this closes the pruned-90% PTQ gap by fine-tuning THROUGH the deployed
# arithmetic: BatchNorm frozen and functionally folded into each conv
# (the exact models.resnet18.fold_all_bn inference fold), folded weights
# fake-quantized per-output-channel, and activations fake-quantized at
# every tap models.resnet18.quantize_resnet18 requantizes, with FIXED
# scales from the same percentile calibration discipline
# (quantize_resnet18.py:103-160).  Gradients reach the conv weights and
# the BN affine (gamma/beta) via STE; block-sparsity masks are re-applied
# after every step, so pruned blocks stay pruned.


def calibrate_resnet_act_scales(
    flat: Dict[str, np.ndarray],
    calib_x: np.ndarray,
    small_input: bool = True,
    stages=None,
    bottleneck: bool = False,
    batch_size: int = 128,
    percentile: Optional[float] = None,
) -> Tuple[float, Dict[str, float]]:
    """(s_input, per-tap scales) of the BN-folded fp32 model — the same
    taps, batching, and outlier-clipping quantize_resnet18 calibrates."""
    from resnet_accel_tpu.models.resnet18 import (_float_forward_taps,
                                                  fold_all_bn)
    folded = fold_all_bn(flat, stages=stages, bottleneck=bottleneck)
    calib_x = np.asarray(calib_x, np.float32)
    maxima: Dict[str, float] = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for i in range(0, len(calib_x), batch_size):
            _, taps = _float_forward_taps(
                folded, jnp.asarray(calib_x[i:i + batch_size]),
                small_input, stages=stages, bottleneck=bottleneck)
            for k, v in taps.items():
                av = np.abs(np.asarray(v))
                m = (float(np.percentile(av, percentile))
                     if percentile is not None else float(av.max()))
                maxima[k] = max(maxima.get(k, 0.0), m)
    s_input = max(float(np.abs(calib_x).max()) / 127.0, 1e-12)
    return s_input, {k: max(m / 127.0, 1e-12) for k, m in maxima.items()}


def _qat_resnet_forward(p, bn_state, x, s_input: float,
                        s_tap: Dict[str, float], small_input: bool,
                        stages, bottleneck: bool):
    """Frozen-BN fake-quant forward mirroring the INT8 inference graph
    (models.resnet18._float_forward_taps tap-for-tap)."""
    from resnet_accel_tpu.models.resnet18 import STAGES
    from resnet_accel_tpu.train.resnet18 import BN_EPS
    stages = STAGES if stages is None else stages

    def conv(cname, bnname, v, stride, padding):
        k = p[f"{bnname}.weight"] * jax.lax.rsqrt(
            bn_state[f"{bnname}.running_var"] + BN_EPS)
        w = p[f"{cname}.weight"] * k[:, None, None, None]
        b = p[f"{bnname}.bias"] \
            - bn_state[f"{bnname}.running_mean"] * k
        y = jax.lax.conv_general_dilated(
            v, fake_quant_per_channel(w), (stride, stride),
            [(padding, padding), (padding, padding)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    def fq(name, v):
        return fake_quant(v, jnp.float32(s_tap[name]))

    a = fake_quant(x, jnp.float32(s_input))
    a = jnp.maximum(conv("conv1", "bn1", a, 1 if small_input else 2,
                         1 if small_input else 3), 0)
    a = fq("stem", a)
    if not small_input:
        a = jax.lax.reduce_window(
            a, jnp.float32(-np.inf), jax.lax.max,
            (1, 1, 3, 3), (1, 1, 2, 2),
            ((0, 0), (0, 0), (1, 1), (1, 1)))
    bi = 0
    s_prev = s_tap["stem"]
    for si, (out_c, blocks, stride) in enumerate(stages, start=1):
        for b in range(blocks):
            base = f"layer{si}.{b}"
            st = stride if b == 0 else 1
            if bottleneck:
                y = jnp.maximum(
                    conv(f"{base}.conv1", f"{base}.bn1", a, 1, 0), 0)
                y = fq(f"b{bi}.c1", y)
                y = jnp.maximum(
                    conv(f"{base}.conv2", f"{base}.bn2", y, st, 1), 0)
                y = fq(f"b{bi}.c2", y)
                y = conv(f"{base}.conv3", f"{base}.bn3", y, 1, 0)
                y = fq(f"b{bi}.c3", y)
            else:
                y = jnp.maximum(
                    conv(f"{base}.conv1", f"{base}.bn1", a, st, 1), 0)
                y = fq(f"b{bi}.c1", y)
                y = conv(f"{base}.conv2", f"{base}.bn2", y, 1, 1)
                y = fq(f"b{bi}.c2", y)
            if f"{base}.downsample.0.weight" in p:
                r = conv(f"{base}.downsample.0", f"{base}.downsample.1",
                         a, st, 0)
                r = fq(f"b{bi}.ds", r)
            else:
                r = a
            a = jnp.maximum(y + r, 0)
            a = fq(f"b{bi}.out", a)
            s_prev = s_tap[f"b{bi}.out"]
            bi += 1
    a = jnp.mean(a, axis=(2, 3))
    # Inference global-avgpools in the int8 domain at the last block's
    # scale (models/resnet18.py fc path); fake-quant the pooled tensor
    # there so fc sees the deployed input grid.
    a = fake_quant(a, jnp.float32(s_prev))
    logits = a @ fake_quant_per_channel(p["fc.weight"]).T + p["fc.bias"]
    return logits


def qat_finetune_resnet(
    flat: Dict[str, np.ndarray],
    images: np.ndarray,
    labels: np.ndarray,
    epochs: int = 2,
    batch_size: int = 128,
    lr: float = 5e-4,
    seed: int = 0,
    small_input: bool = True,
    stages=None,
    bottleneck: bool = False,
    mask_fn: Optional[Callable] = None,
    calib_x: Optional[np.ndarray] = None,
    calib_batch_size: int = 128,
    calib_percentile: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Quant-aware fine-tune of a trained (optionally pruned) ResNet.

    ``flat``: merged torchvision-style dict (train.resnet18.merge_params
    output).  Returns the same flat layout with fine-tuned conv/BN-affine
    /fc weights and UNCHANGED BN running stats — feed it straight to
    quantize_resnet18 with the same calibration settings.
    """
    from resnet_accel_tpu.train.resnet18 import split_params
    if calib_x is None:
        calib_x = images[:512]
    s_input, s_tap = calibrate_resnet_act_scales(
        flat, calib_x, small_input=small_input, stages=stages,
        bottleneck=bottleneck, batch_size=calib_batch_size,
        percentile=calib_percentile)

    params, bn_state = split_params(flat)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    bn_state = {k: jnp.asarray(v) for k, v in bn_state.items()}

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb):
        logits = _qat_resnet_forward(
            p, bn_state, xb, s_input, s_tap, small_input, stages,
            bottleneck)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    @jax.jit
    def step(p, o, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        upd, o = opt.update(grads, o)
        p = optax.apply_updates(p, upd)
        return p, o, loss

    rng = np.random.default_rng(seed)
    n = len(images)
    for _ in range(epochs):
        perm = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i:i + batch_size]
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(images[idx]),
                jnp.asarray(labels[idx].astype(np.int32)))
            if mask_fn is not None:
                params = mask_fn(params)

    out = {k: np.asarray(v) for k, v in params.items()}
    out.update({k: np.asarray(v) for k, v in bn_state.items()})
    return out
