"""ResNet-18 training in JAX — sw/training/train_resnet18.py parity.

Functional re-design of the reference's PyTorch trainer: CIFAR/ImageNet
geometry ResNet-18 with live BatchNorm (batch stats in training, running
stats tracked functionally for inference), SGD-momentum or Adam via optax,
and the BlockSparsePruner discipline — block masks re-applied after every
optimizer step (train_resnet18.py:69-191,282-319).

The trained (params, bn_state) pair feeds models.resnet18.quantize_resnet18
directly: ``export_inference_params`` merges running stats into the
torchvision-style flat dict the quantizer consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from resnet_accel_tpu.models.resnet18 import (STAGES, init_resnet18_fp32)

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


def split_params(flat: Dict[str, np.ndarray]):
    """Split a torchvision-style flat dict into (trainable, bn_state)."""
    train, state = {}, {}
    for k, v in flat.items():
        if k.endswith(".running_mean") or k.endswith(".running_var"):
            state[k] = np.asarray(v, np.float32)
        else:
            train[k] = np.asarray(v, np.float32)
    return train, state


def merge_params(train: Dict, state: Dict) -> Dict[str, np.ndarray]:
    out = {k: np.asarray(v) for k, v in train.items()}
    out.update({k: np.asarray(v) for k, v in state.items()})
    return out


def _bn(name, x, p, s, training):
    gamma = p[f"{name}.weight"][None, :, None, None]
    beta = p[f"{name}.bias"][None, :, None, None]
    if training:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        new_s = {
            f"{name}.running_mean":
                (1 - BN_MOMENTUM) * s[f"{name}.running_mean"]
                + BN_MOMENTUM * mean,
            f"{name}.running_var":
                (1 - BN_MOMENTUM) * s[f"{name}.running_var"]
                + BN_MOMENTUM * var,
        }
    else:
        mean = s[f"{name}.running_mean"]
        var = s[f"{name}.running_var"]
        new_s = {}
    y = (x - mean[None, :, None, None]) * jax.lax.rsqrt(
        var[None, :, None, None] + BN_EPS)
    return y * gamma + beta, new_s


def _conv(name, x, p, stride, padding):
    return jax.lax.conv_general_dilated(
        x, p[f"{name}.weight"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def resnet18_forward(p, s, x, small_input: bool, training: bool,
                     stages=None, bottleneck: bool = False):
    """Returns (logits, updated bn_state).  ``stages``/``bottleneck``
    generalize to the family plans (models/resnet.py); defaults are
    ResNet-18."""
    stages = STAGES if stages is None else stages
    updates = {}

    def bn(name, x):
        y, u = _bn(name, x, p, s, training)
        updates.update(u)
        return y

    a = _conv("conv1", x, p, 1 if small_input else 2,
              1 if small_input else 3)
    a = jnp.maximum(bn("bn1", a), 0)
    if not small_input:
        N, C, H, W = a.shape
        ap = jnp.pad(a, ((0, 0), (0, 0), (1, 1), (1, 1)),
                     constant_values=-jnp.inf)
        # 3x3/2 maxpool via strided slice-max (differentiable under jit).
        slices = [ap[:, :, i:i + 2 * (H // 2) + 1:2,
                     j:j + 2 * (W // 2) + 1:2]
                  for i in range(3) for j in range(3)]
        m = slices[0]
        for sl in slices[1:]:
            m = jnp.maximum(m, sl)
        a = m

    bi = 0
    for si, (out_c, blocks, stride) in enumerate(stages, start=1):
        for b in range(blocks):
            base = f"layer{si}.{b}"
            st = stride if b == 0 else 1
            if bottleneck:
                y = _conv(f"{base}.conv1", a, p, 1, 0)
                y = jnp.maximum(bn(f"{base}.bn1", y), 0)
                y = _conv(f"{base}.conv2", y, p, st, 1)
                y = jnp.maximum(bn(f"{base}.bn2", y), 0)
                y = _conv(f"{base}.conv3", y, p, 1, 0)
                y = bn(f"{base}.bn3", y)
            else:
                y = _conv(f"{base}.conv1", a, p, st, 1)
                y = jnp.maximum(bn(f"{base}.bn1", y), 0)
                y = _conv(f"{base}.conv2", y, p, 1, 1)
                y = bn(f"{base}.bn2", y)
            if f"{base}.downsample.0.weight" in p:
                r = _conv(f"{base}.downsample.0", a, p, st, 0)
                r = bn(f"{base}.downsample.1", r)
            else:
                r = a
            a = jnp.maximum(y + r, 0)
            bi += 1

    a = jnp.mean(a, axis=(2, 3))
    logits = a @ p["fc.weight"].T + p["fc.bias"]
    return logits, updates


@dataclasses.dataclass
class TrainState:
    params: Dict
    bn_state: Dict
    opt_state: object
    history: list


def train_resnet18(
    images: np.ndarray,
    labels: np.ndarray,
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 0.05,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    seed: int = 0,
    num_classes: int = 10,
    small_input: bool = True,
    mask_fn: Optional[Callable] = None,
    reg_fn: Optional[Callable] = None,
    init: Optional[Dict[str, np.ndarray]] = None,
    stages=None,
    bottleneck: bool = False,
) -> TrainState:
    """SGD-momentum training with per-step mask re-application.

    ``images``: fp32 NCHW (normalized); ``mask_fn``/``reg_fn`` as in
    train.mnist (the BlockSparsePruner hooks).
    """
    flat = init if init is not None else init_resnet18_fp32(
        seed=seed, num_classes=num_classes, small_input=small_input,
        stages=stages, bottleneck=bottleneck)
    params, bn_state = split_params(flat)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    bn_state = {k: jnp.asarray(v) for k, v in bn_state.items()}

    opt = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum))
    opt_state = opt.init(params)

    def loss_fn(p, s, xb, yb):
        logits, updates = resnet18_forward(
            p, s, xb, small_input, True, stages=stages,
            bottleneck=bottleneck)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()
        if reg_fn is not None:
            loss = loss + reg_fn(p)
        acc = (logits.argmax(-1) == yb).mean()
        return loss, (updates, acc)

    @jax.jit
    def step(p, s, o, xb, yb):
        (loss, (updates, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, s, xb, yb)
        upd, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, upd)
        s = {**s, **updates}
        return p, s, o, loss, acc

    rng = np.random.default_rng(seed)
    n = len(images)
    history = []
    for epoch in range(epochs):
        perm = rng.permutation(n)
        losses, accs = [], []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i:i + batch_size]
            params, bn_state, opt_state, loss, acc = step(
                params, bn_state, opt_state, jnp.asarray(images[idx]),
                jnp.asarray(labels[idx].astype(np.int32)))
            if mask_fn is not None:
                params = mask_fn(params)
            losses.append(float(loss))
            accs.append(float(acc))
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "train_acc": float(np.mean(accs))})
    return TrainState(params=params, bn_state=bn_state,
                      opt_state=opt_state, history=history)


def export_inference_params(state: TrainState) -> Dict[str, np.ndarray]:
    """Merge trained params + running BN stats into the flat dict consumed
    by models.resnet18.quantize_resnet18."""
    return merge_params(
        {k: np.asarray(v) for k, v in state.params.items()},
        {k: np.asarray(v) for k, v in state.bn_state.items()})
