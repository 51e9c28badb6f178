"""MNIST CNN training in JAX — the reference trainer, TPU-native.

Re-design of sw/MNIST CNN/train_mnist.py (PyTorch/Adam, deterministic
seeding, checkpoint + golden-vector export) as a pure JAX/optax trainer:
functional params, jitted train step, same architecture
(conv1 1->32 3x3, conv2 32->64 3x3, maxpool2, fc1 9216->128, fc2 128->10)
and the same normalization constants, so its checkpoints feed the same
quantize -> BSR-export -> inference pipeline.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from resnet_accel_tpu.models.mnist_cnn import MNIST_MEAN, MNIST_STD


def init_mnist_params(seed: int = 1917) -> Dict[str, np.ndarray]:
    """He-init FP32 params, deterministic (train_mnist.py:12-23 seeds)."""
    rng = np.random.default_rng(seed)

    def conv(o, i, k):
        return rng.normal(0, np.sqrt(2.0 / (i * k * k)),
                          (o, i, k, k)).astype(np.float32)

    def lin(o, i):
        return rng.normal(0, np.sqrt(2.0 / i), (o, i)).astype(np.float32)

    return {
        "conv1.weight": conv(32, 1, 3),
        "conv1.bias": np.zeros(32, np.float32),
        "conv2.weight": conv(64, 32, 3),
        "conv2.bias": np.zeros(64, np.float32),
        "fc1.weight": lin(128, 9216),
        "fc1.bias": np.zeros(128, np.float32),
        "fc2.weight": lin(10, 128),
        "fc2.bias": np.zeros(10, np.float32),
    }


def mnist_forward_fp32(params, x):
    """FP32 forward, NCHW (architecture of train_mnist.py:32-50)."""
    def conv(x, w, b, ):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    a = jnp.maximum(conv(x, params["conv1.weight"], params["conv1.bias"]), 0)
    a = jnp.maximum(conv(a, params["conv2.weight"], params["conv2.bias"]), 0)
    # 2x2/2 maxpool via reshape-max: differentiable under jit on every
    # jax version (jit(grad(reduce_window)) is broken in jax 0.9.0).
    N, C, H, W = a.shape
    a = a.reshape(N, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    a = a.reshape(a.shape[0], -1)
    a = jnp.maximum(a @ params["fc1.weight"].T + params["fc1.bias"], 0)
    return a @ params["fc2.weight"].T + params["fc2.bias"]


@dataclasses.dataclass
class TrainResult:
    params: Dict[str, np.ndarray]
    history: list
    best_acc: float
    seed: int
    hparams: Dict


def train_mnist(
    images_u8: np.ndarray,
    labels: np.ndarray,
    epochs: int = 2,
    batch_size: int = 128,
    lr: float = 1e-3,
    seed: int = 1917,
    eval_frac: float = 0.1,
    mask_fn: Optional[Callable] = None,
    reg_fn: Optional[Callable] = None,
    params: Optional[Dict[str, np.ndarray]] = None,
) -> TrainResult:
    """Adam training loop with optional sparsity mask re-application.

    ``mask_fn(params) -> params`` is applied after every optimizer step —
    the mask-re-apply discipline of the reference's BlockSparsePruner
    (train_resnet18.py:282-319).  ``reg_fn(params) -> scalar`` adds a
    regularizer (group lasso for block pruning).
    """
    x = ((images_u8.astype(np.float32) / 255.0) - MNIST_MEAN) / MNIST_STD
    x = x.reshape(-1, 1, 28, 28)
    y = np.asarray(labels, np.int32)

    n_eval = max(1, int(len(x) * eval_frac))
    x_eval, y_eval = x[:n_eval], y[:n_eval]
    x_tr, y_tr = x[n_eval:], y[n_eval:]

    if params is None:
        params = init_mnist_params(seed)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb):
        logits = mnist_forward_fp32(p, xb)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()
        if reg_fn is not None:
            loss = loss + reg_fn(p)
        return loss

    @jax.jit
    def step(p, s, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, s = opt.update(grads, s)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    @jax.jit
    def evaluate(p, xb, yb):
        logits = mnist_forward_fp32(p, xb)
        return (logits.argmax(-1) == yb).mean()

    rng = np.random.default_rng(seed)
    history, best_acc = [], 0.0
    n = len(x_tr)
    for epoch in range(epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i:i + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x_tr[idx]),
                jnp.asarray(y_tr[idx]))
            if mask_fn is not None:
                params = mask_fn(params)
            losses.append(float(loss))
        acc = float(evaluate(params, jnp.asarray(x_eval),
                             jnp.asarray(y_eval)))
        best_acc = max(best_acc, acc)
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "eval_acc": acc})
    return TrainResult(
        params={k: np.asarray(v) for k, v in params.items()},
        history=history, best_acc=best_acc, seed=seed,
        hparams={"epochs": epochs, "batch_size": batch_size, "lr": lr})


def save_checkpoint(result: TrainResult, path: str) -> None:
    """Checkpoint with seed/hparams/best_acc audit trail
    (train_mnist.py:147-159 parity), as npz + json sidecar."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **result.params)
    with open(path + ".meta.json", "w") as f:
        json.dump({"seed": result.seed, "hparams": result.hparams,
                   "best_acc": result.best_acc,
                   "history": result.history}, f, indent=2)


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return {k: data[k] for k in data.files}


def export_golden_vectors(
    result: TrainResult, images_u8: np.ndarray, out_dir: str,
    num: int = 32,
) -> None:
    """Save golden inputs + fp32 logits (train_mnist.py:161-166 parity)."""
    os.makedirs(out_dir, exist_ok=True)
    imgs = images_u8[:num]
    np.save(os.path.join(out_dir, "mnist_inputs.npy"), imgs)
    x = ((imgs.astype(np.float32) / 255.0) - MNIST_MEAN) / MNIST_STD
    logits = mnist_forward_fp32(
        {k: jnp.asarray(v) for k, v in result.params.items()},
        jnp.asarray(x.reshape(-1, 1, 28, 28)))
    np.save(os.path.join(out_dir, "mnist_logits_fp32.npy"),
            np.asarray(logits))
