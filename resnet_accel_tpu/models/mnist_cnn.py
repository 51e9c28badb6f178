"""MNIST CNN INT8 inference — the reference's end-to-end model, on TPU.

Architecture (reference sw/MNIST CNN/train_mnist.py:32-50):
    conv1 1->32 3x3 s1 p0 -> ReLU
    conv2 32->64 3x3 s1 p0 -> ReLU
    maxpool 2x2
    flatten (NCHW order -> 64*12*12 = 9216)
    fc1 9216->128 -> ReLU
    fc2 128->10

Both a golden numpy path and a jit-able TPU path run the same INT8
pipeline with SHARED precomputed float32 requant factors, so they match
bit-for-bit:

    q(x, s0) -> conv1+b+relu -> requant(s1) -> conv2+b+relu -> requant(s2)
    -> maxpool -> flatten -> fc1+b+relu -> requant(s3) -> fc2+b
    -> dequantize logits

Weights load directly from the reference's exported INT8 artifacts
(data/int8/*_weight_int8.npy + *_weight_scales.npy + int8 biases with
per-tensor scales, produced by sw/INT8 quantization/quantize.py).
Activation scales come from calibration on the golden inputs with the
dequantized-weight float model (the reference computed them the same way
from its FP32 checkpoint, quantize.py:217-264).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops import (
    conv2d_int8,
    matmul_int8,
    maxpool2d_int8,
    quantize_input,
    requant_factors,
)
from resnet_accel_tpu.ops.bsr_matmul import (
    KernelBSR,
    bsr_matmul_wt,
    pack_kernel_bsr,
)
from resnet_accel_tpu.quant import bias_to_int32
from resnet_accel_tpu.sparse import build_bsr_int8_direct

#: MNIST normalization constants (train_mnist.py / quantize.py:235).
MNIST_MEAN, MNIST_STD = 0.1307, 0.3081


@dataclasses.dataclass
class MNISTCNNInt8:
    """All static data for INT8 MNIST inference."""

    # INT8 weights (conv weights pre-flattened [O, I*K*K]).
    conv1_w: np.ndarray      # [32, 9]
    conv2_w: np.ndarray      # [64, 288]
    fc1_w: np.ndarray        # [128, 9216]
    fc2_w: np.ndarray        # [10, 128]
    # int32 accumulator-domain biases.
    conv1_b: np.ndarray
    conv2_b: np.ndarray
    fc1_b: np.ndarray
    fc2_b: np.ndarray
    # Activation scales s0..s3 (input, conv1_out, conv2_out, fc1_out).
    act_scales: Tuple[float, float, float, float]
    # Per-channel weight scales (for the final dequant + factor building).
    fc2_w_scales: np.ndarray
    # Precomputed float32 requant factors (shared golden <-> TPU).
    conv1_f: np.ndarray
    conv2_f: np.ndarray
    fc1_f: np.ndarray
    # Optional zero-skip weights for fc1 (the layer the reference's BSR
    # path targets; data/bsr_export_14x14/fc1).
    fc1_bsr: Optional[KernelBSR] = None

    # ----------------------------------------------------------------- load
    @classmethod
    def from_arrays(
        cls,
        weights: Dict[str, np.ndarray],
        weight_scales: Dict[str, np.ndarray],
        biases_fp32: Dict[str, np.ndarray],
        act_scales: Tuple[float, float, float, float],
    ) -> "MNISTCNNInt8":
        """Build from INT8 weights + fp32 biases + calibrated act scales."""
        s0, s1, s2, s3 = act_scales
        w1 = weights["conv1"].reshape(32, -1)
        w2 = weights["conv2"].reshape(64, -1)
        w3 = weights["fc1"]
        w4 = weights["fc2"]
        return cls(
            conv1_w=w1, conv2_w=w2, fc1_w=w3, fc2_w=w4,
            conv1_b=bias_to_int32(biases_fp32["conv1"], s0,
                                  weight_scales["conv1"]),
            conv2_b=bias_to_int32(biases_fp32["conv2"], s1,
                                  weight_scales["conv2"]),
            fc1_b=bias_to_int32(biases_fp32["fc1"], s2,
                                weight_scales["fc1"]),
            fc2_b=bias_to_int32(biases_fp32["fc2"], s3,
                                weight_scales["fc2"]),
            act_scales=(s0, s1, s2, s3),
            fc2_w_scales=np.asarray(weight_scales["fc2"], np.float32),
            conv1_f=requant_factors(s0, weight_scales["conv1"], s1),
            conv2_f=requant_factors(s1, weight_scales["conv2"], s2),
            fc1_f=requant_factors(s2, weight_scales["fc1"], s3),
        )

    @classmethod
    def from_int8_dir(
        cls, int8_dir: str, calib_inputs: np.ndarray
    ) -> "MNISTCNNInt8":
        """Load the reference's data/int8 export and calibrate act scales.

        ``calib_inputs``: raw uint8-style images [N, 28, 28] (the golden
        inputs, sw/golden/mnist_inputs.npy) — normalized here exactly like
        quantize.py:227-235.
        """
        weights, scales, biases = {}, {}, {}
        for layer in ("conv1", "conv2", "fc1", "fc2"):
            weights[layer] = np.load(
                os.path.join(int8_dir, f"{layer}_weight_int8.npy"))
            scales[layer] = np.load(
                os.path.join(int8_dir, f"{layer}_weight_scales.npy"))
            b_i8 = np.load(os.path.join(int8_dir, f"{layer}_bias_int8.npy"))
            with open(os.path.join(int8_dir,
                                   f"{layer}_bias_scale.json")) as f:
                b_scale = json.load(f)["scale"]
            biases[layer] = b_i8.astype(np.float32) * np.float32(b_scale)

        x = calib_inputs.astype(np.float32)
        if x.max() > 4.0:  # raw pixels -> normalize
            x = x / 255.0
        x = (x - MNIST_MEAN) / MNIST_STD
        x = x.reshape(-1, 1, 28, 28)
        act_scales = _calibrate_act_scales(x, weights, scales, biases)
        return cls.from_arrays(weights, scales, biases, act_scales)

    def as_device_params(self) -> Dict[str, jnp.ndarray]:
        """Upload everything the jitted forward needs (device_put once —
        the TPU-native analog of the reference's weight DMA)."""
        params = {
            "conv1_w": jnp.asarray(self.conv1_w),
            "conv2_w": jnp.asarray(self.conv2_w),
            "fc1_wT": jnp.asarray(self.fc1_w.T),
            "fc2_wT": jnp.asarray(self.fc2_w.T),
            "conv1_b": jnp.asarray(self.conv1_b),
            "conv2_b": jnp.asarray(self.conv2_b),
            "fc1_b": jnp.asarray(self.fc1_b),
            "fc2_b": jnp.asarray(self.fc2_b),
            "conv1_f": jnp.asarray(self.conv1_f),
            "conv2_f": jnp.asarray(self.conv2_f),
            "fc1_f": jnp.asarray(self.fc1_f),
            "fc2_deq": jnp.asarray(
                np.float32(self.act_scales[3]) * self.fc2_w_scales),
        }
        if self.fc1_bsr is not None:
            kb = self.fc1_bsr
            params.update({
                "fc1.bsr.blocks": kb.blocks,
                "fc1.bsr.col": kb.col_of,
                "fc1.bsr.row": kb.row_of,
                "fc1.bsr.first": kb.first_of,
                "fc1.bsr.last": kb.last_of,
            })
        return params

    def with_fc1_bsr(self, block: int = 128,
                     chunk: int = 16) -> "MNISTCNNInt8":
        """Attach the zero-skip BSR stream for fc1 (block-pruned weights
        produce zero blocks; dense weights work too, just without skip)."""
        bsr = build_bsr_int8_direct(self.fc1_w, block)
        return dataclasses.replace(
            self, fc1_bsr=pack_kernel_bsr(bsr, chunk=chunk))

    def sparsity_report(self):
        if self.fc1_bsr is None:
            return {}
        kb = self.fc1_bsr
        return {"fc1": 1.0 - kb.nnz_source / kb.total_source}


def _calibrate_act_scales(x, weights, scales, biases):
    """Float forward with dequantized weights to observe activation ranges
    (the reference's quantize_activations_from_golden, quantize.py:217)."""
    def deq(layer, shape=None):
        w = weights[layer].astype(np.float32)
        s = scales[layer].reshape((-1,) + (1,) * (w.ndim - 1))
        return w * s

    s0 = max(float(np.abs(x).max()) / 127.0, 1e-12)
    # conv1
    a = _conv_f32(x, deq("conv1"), biases["conv1"])
    a = np.maximum(a, 0)
    s1 = max(float(np.abs(a).max()) / 127.0, 1e-12)
    # conv2
    a = _conv_f32(a, deq("conv2"), biases["conv2"])
    a = np.maximum(a, 0)
    s2 = max(float(np.abs(a).max()) / 127.0, 1e-12)
    # pool + fc1
    N, C, H, W = a.shape
    a = a.reshape(N, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    a = a.reshape(N, -1)
    a = a @ deq("fc1").T + biases["fc1"]
    a = np.maximum(a, 0)
    s3 = max(float(np.abs(a).max()) / 127.0, 1e-12)
    return (s0, s1, s2, s3)


def _conv_f32(x, w, b):
    """Tiny float conv (valid, stride 1) for calibration only."""
    N, C, H, W = x.shape
    O, _, K, _ = w.shape
    Ho, Wo = H - K + 1, W - K + 1
    cols = np.stack([
        x[:, :, kh:kh + Ho, kw:kw + Wo]
        for kh in range(K) for kw in range(K)
    ], axis=-1)                                    # [N,C,Ho,Wo,K*K]
    cols = cols.transpose(0, 2, 3, 1, 4).reshape(N, Ho * Wo, C * K * K)
    out = cols @ w.reshape(O, -1).T + b
    return out.reshape(N, Ho, Wo, O).transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------
# TPU forward
# --------------------------------------------------------------------------

def make_forward(
    model: MNISTCNNInt8,
    use_pallas: bool = True,
    backend: Optional[str] = None,
    conv_method: str = "native",
):
    """Build the jit-able INT8 forward: fp32 NCHW images -> fp32 logits.

    int8 input is accepted as already-quantized (native.BatchLoader's
    output with quant_scale = model.act_scales[0]); the on-device
    quantize step is skipped."""
    s0, s1, s2, s3 = model.act_scales

    def forward(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
        xq = x if x.dtype == jnp.int8 else quantize_input(x, s0)
        a = conv2d_int8(xq, params["conv1_w"], bias=params["conv1_b"],
                        kernel=3, factors=params["conv1_f"], relu=True,
                        use_pallas=use_pallas, backend=backend,
                        method=conv_method)
        a = conv2d_int8(a, params["conv2_w"], bias=params["conv2_b"],
                        kernel=3, factors=params["conv2_f"], relu=True,
                        use_pallas=use_pallas, backend=backend,
                        method=conv_method)
        a = maxpool2d_int8(a, 2, 2)
        a = a.reshape(a.shape[0], -1)
        if model.fc1_bsr is not None and use_pallas:
            import dataclasses as _dc
            kb = _dc.replace(
                model.fc1_bsr,
                blocks=params["fc1.bsr.blocks"],
                col_of=params["fc1.bsr.col"],
                row_of=params["fc1.bsr.row"],
                first_of=params["fc1.bsr.first"],
                last_of=params["fc1.bsr.last"])
            a = bsr_matmul_wt(a, kb, bias=params["fc1_b"],
                              factors=params["fc1_f"], relu=True,
                              backend=backend)
        else:
            a = matmul_int8(a, params["fc1_wT"], bias=params["fc1_b"],
                            factors=params["fc1_f"], relu=True,
                            use_pallas=use_pallas, backend=backend)
        acc = matmul_int8(a, params["fc2_wT"], bias=params["fc2_b"],
                          use_pallas=use_pallas, backend=backend)
        return acc.astype(jnp.float32) * params["fc2_deq"][None, :]

    return forward


# --------------------------------------------------------------------------
# Golden forward (numpy, per-sample) — the bit-exactness oracle
# --------------------------------------------------------------------------

def _requant_by_factors(acc, factors, relu):
    acc = acc.astype(np.int64)
    if relu:
        acc = np.maximum(acc, 0)
    scaled = acc.astype(np.int32).astype(np.float32) * factors
    return np.clip(np.rint(scaled), -128, 127).astype(np.int8)


def forward_golden(model: MNISTCNNInt8, x: np.ndarray) -> np.ndarray:
    """Pure-numpy golden forward, same INT8 pipeline + shared factors."""
    s0 = model.act_scales[0]
    xq = np.clip(np.rint(x.astype(np.float32) / np.float32(s0)),
                 -128, 127).astype(np.int8)
    logits = np.empty((x.shape[0], 10), dtype=np.float32)
    deq = np.float32(model.act_scales[3]) * model.fc2_w_scales
    for n in range(x.shape[0]):
        a = golden.conv2d_int8_im2col(
            xq[n], model.conv1_w, model.conv1_b, 1, 3)
        a = _requant_by_factors(a, model.conv1_f[:, None, None], relu=True)
        a = golden.conv2d_int8_im2col(
            a, model.conv2_w, model.conv2_b, 32, 3)
        a = _requant_by_factors(a, model.conv2_f[:, None, None], relu=True)
        a = golden.maxpool2d_int8(a, 2, 2)
        a = a.reshape(1, -1)
        acc = golden.matmul_int8(a, model.fc1_w.T).astype(np.int64) \
            + model.fc1_b[None, :]
        a = _requant_by_factors(acc, model.fc1_f[None, :], relu=True)
        acc = golden.matmul_int8(a, model.fc2_w.T).astype(np.int64) \
            + model.fc2_b[None, :]
        logits[n] = acc.astype(np.int32).astype(np.float32) * deq[None, :]
    return logits
