"""ResNet-18 INT8 inference — the engine the reference left as a stub.

The reference defines a 21-layer ResNet-18 table and an inference API but
its run_inference returns a hard-coded result
(hw/sim/cpp/src/resnet_inference.cpp:210-246, hpp:121-133).  This module
is the real thing, TPU-native:

- conv -> im2col -> fused int8 MXU GEMM (+bias +ReLU +per-channel requant)
- BatchNorm folded into conv weights at quantization time (so the fused
  conv-BN-ReLU-requant layer of BASELINE.json config 4 is ONE kernel)
- residual adds via the golden dequant-add-requant semantics
  (golden_models.cpp:465) with fused post-add ReLU
- downsample (1x1/2) paths, stem maxpool, global avgpool with the
  golden's truncating rounding, final FC to logits
- any layer can carry block-sparse (BSR) weights -> the zero-skip kernel

Geometries: ImageNet (7x7/2 stem + 3x3/2 maxpool, 224x224) and CIFAR
(3x3/1 stem, no maxpool, 32x32) — mirroring the reference trainer's
CIFAR-10/ImageNet support (sw/training/train_resnet18.py).

Pipeline per basic block (all int8 between layers):
    x(s_in) -> conv1+BN+ReLU -> requant(s_b1) -> conv2+BN -> requant(s_mn)
    residual = x         (identity)  @ s_in
             | downsample(x)         @ s_ds
    out = requant(dequant(main) + dequant(residual), s_out) ; ReLU
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops import (
    add_residual,
    exact_inv_out_scale,
    expand_add_int8,
    avgpool_global_int8,
    conv2d_int8,
    matmul_int8,
    maxpool2d_int8,
    quantize_input,
    requant_factors,
)
from resnet_accel_tpu.ops import conv_pm
from resnet_accel_tpu.ops.conv import (
    conv2d_int8_nhwc,
    space_to_depth_nchw,
    space_to_depth_nhwc,
    stem_s2d_weights,
)
from resnet_accel_tpu.ops.pooling import (
    avgpool_global_int8_nhwc,
    maxpool2d_int8_nhwc,
)
from resnet_accel_tpu.ops.stem_pack import (quantize_s2d_nm,
                                            quantize_s2d_wh,
                                            transpose_taps)
from resnet_accel_tpu.runtime import backend as backend_mod
from resnet_accel_tpu.ops.bsr_matmul import (
    KernelBSR,
    bsr_matmul_wt,
    pack_kernel_bsr,
)
from resnet_accel_tpu.ops.conv import im2col_nchw
from resnet_accel_tpu.quant import (
    bias_to_int32,
    quantize_symmetric_per_channel,
)
from resnet_accel_tpu.sparse import build_bsr_int8_direct

#: Stage plan: (out_channels, blocks, first_stride) — resnet_inference.hpp
#: layer table (4 stages x 2 basic blocks, downsample at stage 2-4 starts).
STAGES = [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]
#: Deeper family plans (torchvision geometry).  18/34 use basic blocks
#: (expansion 1); 50/101/152 use bottlenecks (1x1 -> 3x3 -> 1x1,
#: expansion 4).  models/resnet.py dispatches on depth.
STAGE_PLANS = {
    18: STAGES,
    34: [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)],
    50: [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)],
    101: [(64, 3, 1), (128, 4, 2), (256, 23, 2), (512, 3, 2)],
    152: [(64, 3, 1), (128, 8, 2), (256, 36, 2), (512, 3, 2)],
}
BOTTLENECK_DEPTHS = frozenset({50, 101, 152})
EXPANSION = 4  # bottleneck output channels = out_c * EXPANSION
BN_EPS = 1e-5


# ==========================================================================
# FP32 parameter construction / BN folding
# ==========================================================================

def init_resnet18_fp32(
    seed: int = 0, num_classes: int = 1000, small_input: bool = False,
    stages=None, bottleneck: bool = False,
) -> Dict[str, np.ndarray]:
    """He-init FP32 parameters in torchvision's flat naming scheme.

    Deterministic (seeded) so tests are reproducible — the reference
    seeds all its trainers the same way (train_mnist.py:12-23).
    ``stages``/``bottleneck`` generalize the plan to the full family
    (models/resnet.py); defaults are ResNet-18.
    """
    stages = STAGES if stages is None else stages
    rng = np.random.default_rng(seed)
    p: Dict[str, np.ndarray] = {}

    def conv(name, o, i, k):
        fan_in = i * k * k
        p[f"{name}.weight"] = (
            rng.normal(0, np.sqrt(2.0 / fan_in), (o, i, k, k))
        ).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)          # gamma
        p[f"{name}.bias"] = np.zeros(c, np.float32)           # beta
        p[f"{name}.running_mean"] = (
            rng.normal(0, 0.1, c).astype(np.float32))
        p[f"{name}.running_var"] = (
            rng.uniform(0.5, 1.5, c).astype(np.float32))

    if small_input:
        conv("conv1", 64, 3, 3)
    else:
        conv("conv1", 64, 3, 7)
    bn("bn1", 64)

    in_c = 64
    for si, (out_c, blocks, stride) in enumerate(stages, start=1):
        exp_c = out_c * EXPANSION if bottleneck else out_c
        for b in range(blocks):
            base = f"layer{si}.{b}"
            c_in = in_c if b == 0 else exp_c
            if bottleneck:
                conv(f"{base}.conv1", out_c, c_in, 1)
                bn(f"{base}.bn1", out_c)
                conv(f"{base}.conv2", out_c, out_c, 3)
                bn(f"{base}.bn2", out_c)
                conv(f"{base}.conv3", exp_c, out_c, 1)
                bn(f"{base}.bn3", exp_c)
            else:
                conv(f"{base}.conv1", out_c, c_in, 3)
                bn(f"{base}.bn1", out_c)
                conv(f"{base}.conv2", out_c, out_c, 3)
                bn(f"{base}.bn2", out_c)
            if b == 0 and (stride != 1 or c_in != exp_c):
                conv(f"{base}.downsample.0", exp_c, c_in, 1)
                bn(f"{base}.downsample.1", exp_c)
        in_c = exp_c

    p["fc.weight"] = (
        rng.normal(0, 0.01, (num_classes, in_c)).astype(np.float32))
    p["fc.bias"] = np.zeros(num_classes, np.float32)
    return p


def fold_bn(
    conv_w: np.ndarray, bn_gamma, bn_beta, bn_mean, bn_var,
    eps: float = BN_EPS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold inference-mode BatchNorm into the preceding conv.

    w' = w * gamma/sqrt(var+eps) (per out channel); b' = beta - mean*that.
    """
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]
    b = bn_beta - bn_mean * scale
    return w.astype(np.float32), b.astype(np.float32)


def fold_all_bn(params_fp32: Dict[str, np.ndarray], stages=None,
                bottleneck: bool = False) -> Dict[str, np.ndarray]:
    """Fold every BatchNorm of a torchvision-style flat dict into its
    conv: {conv: w', conv+'.bias': b'} for the whole trunk plus the fc
    passthrough — the folding quantize_resnet18 deploys, shared with QAT
    (train/qat.py) so both see the identical inference arithmetic."""
    stages = STAGES if stages is None else stages
    folded: Dict[str, np.ndarray] = {}

    def fold(conv_name, bn_name):
        w, b = fold_bn(
            params_fp32[f"{conv_name}.weight"],
            params_fp32[f"{bn_name}.weight"],
            params_fp32[f"{bn_name}.bias"],
            params_fp32[f"{bn_name}.running_mean"],
            params_fp32[f"{bn_name}.running_var"])
        folded[conv_name] = w
        folded[conv_name + ".bias"] = b

    fold("conv1", "bn1")
    for si, (out_c, blocks, _) in enumerate(stages, start=1):
        for b in range(blocks):
            base = f"layer{si}.{b}"
            fold(f"{base}.conv1", f"{base}.bn1")
            fold(f"{base}.conv2", f"{base}.bn2")
            if bottleneck:
                fold(f"{base}.conv3", f"{base}.bn3")
            if f"{base}.downsample.0.weight" in params_fp32:
                fold(f"{base}.downsample.0", f"{base}.downsample.1")
    folded["fc.weight"] = params_fp32["fc.weight"]
    folded["fc.bias"] = params_fp32["fc.bias"]
    return folded


# ==========================================================================
# Quantized model structure
# ==========================================================================

@dataclasses.dataclass
class QConv:
    """One fused conv(-BN)(-ReLU)(-requant) layer, ready for the kernel."""

    w2d: np.ndarray          # [O, I*K*K] int8
    bias: np.ndarray         # [O] int32 (accumulator domain)
    factors: np.ndarray      # [O] float32 requant factors
    in_channels: int
    kernel: int
    stride: int
    padding: int
    relu: bool
    # Optional block-sparse weights (regrouped for the zero-skip kernel).
    bsr: Optional[object] = None  # ops.bsr_matmul.KernelBSR


@dataclasses.dataclass
class QBlock:
    conv1: QConv
    conv2: QConv
    downsample: Optional[QConv]
    s_in: float
    s_main: float
    s_res: float             # scale of the residual path (s_in or s_ds)
    s_out: float

    def named_convs(self, i: int):
        yield f"b{i}.c1", self.conv1
        yield f"b{i}.c2", self.conv2
        if self.downsample is not None:
            yield f"b{i}.ds", self.downsample


@dataclasses.dataclass
class QBottleneck:
    """Bottleneck residual block (1x1 -> 3x3 -> 1x1, expansion 4) for the
    deeper family (ResNet-50/101/152); the 1x1 convs are GEMM-shaped,
    exactly where the zero-skip BSR kernel wins (docs/ARCHITECTURE.md)."""

    conv1: QConv             # 1x1 reduce, ReLU
    conv2: QConv             # 3x3 (carries the stride), ReLU
    conv3: QConv             # 1x1 expand, no ReLU (pre-residual)
    downsample: Optional[QConv]
    s_in: float
    s_main: float            # scale of the conv3 output
    s_res: float
    s_out: float

    def named_convs(self, i: int):
        yield f"b{i}.c1", self.conv1
        yield f"b{i}.c2", self.conv2
        yield f"b{i}.c3", self.conv3
        if self.downsample is not None:
            yield f"b{i}.ds", self.downsample


@dataclasses.dataclass
class ResNet18Int8:
    stem: QConv
    blocks: List[QBlock]
    fc_w: np.ndarray         # [num_classes, 512] int8
    fc_b: np.ndarray         # [num_classes] int32
    fc_deq: np.ndarray       # [num_classes] float32 dequant of fc acc
    s_input: float
    small_input: bool
    num_classes: int

    def as_device_params(self) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}

        def put(prefix, qc: QConv):
            out[f"{prefix}.w"] = jnp.asarray(qc.w2d)
            # HWIO copy for the NHWC (channel-minor) fast path.
            w4 = qc.w2d.reshape(-1, qc.in_channels, qc.kernel, qc.kernel)
            out[f"{prefix}.whwio"] = jnp.asarray(
                np.ascontiguousarray(w4.transpose(2, 3, 1, 0)))
            out[f"{prefix}.b"] = jnp.asarray(qc.bias)
            out[f"{prefix}.f"] = jnp.asarray(qc.factors)

        put("stem", self.stem)
        for i, blk in enumerate(self.blocks):
            for prefix, qc in blk.named_convs(i):
                put(prefix, qc)
        out["fc.w"] = jnp.asarray(self.fc_w.T)
        out["fc.b"] = jnp.asarray(self.fc_b)
        out["fc.deq"] = jnp.asarray(self.fc_deq)
        # BSR weight streams for sparse layers (the device-side artifact
        # upload of the zero-skip kernel).
        for prefix, qc in self.named_convs():
            if qc.bsr is not None:
                kb: KernelBSR = qc.bsr
                out[f"{prefix}.bsr.blocks"] = kb.blocks
                out[f"{prefix}.bsr.col"] = kb.col_of
                out[f"{prefix}.bsr.row"] = kb.row_of
                out[f"{prefix}.bsr.first"] = kb.first_of
                out[f"{prefix}.bsr.last"] = kb.last_of
        return out

    def named_convs(self):
        yield "stem", self.stem
        for i, blk in enumerate(self.blocks):
            yield from blk.named_convs(i)

    def sparsity_report(self) -> Dict[str, float]:
        """Per-layer block sparsity of attached BSR weights
        (get_model_sparsity parity, resnet_inference.hpp)."""
        report = {}
        for prefix, qc in self.named_convs():
            if qc.bsr is not None:
                kb: KernelBSR = qc.bsr
                report[prefix] = 1.0 - kb.nnz_source / kb.total_source
        return report


# ==========================================================================
# Quantization (PTQ with calibration)
# ==========================================================================

def _float_forward_taps(params, x, small_input, stages=None,
                        bottleneck: bool = False):
    """Inference-mode FP32 forward (BN folded) returning activation taps.

    Calibration-only; uses lax.conv for speed (quantize_resnet18.py's
    ActivationCalibrator role, :103-160).
    """
    stages = STAGES if stages is None else stages
    taps = {}

    def conv(name, x, stride, padding):
        w = params[name]                     # folded [O,I,K,K]
        b = params[name + ".bias"]
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (stride, stride),
            [(padding, padding), (padding, padding)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + jnp.asarray(b)[None, :, None, None]

    if small_input:
        a = conv("conv1", x, 1, 1)
    else:
        a = conv("conv1", x, 2, 3)
    a = jnp.maximum(a, 0)
    taps["stem"] = a
    if not small_input:
        a = jax.lax.reduce_window(
            a, jnp.float32(-np.inf), jax.lax.max,
            (1, 1, 3, 3), (1, 1, 2, 2),
            ((0, 0), (0, 0), (1, 1), (1, 1)))
    bi = 0
    for si, (out_c, blocks, stride) in enumerate(stages, start=1):
        for b in range(blocks):
            base = f"layer{si}.{b}"
            st = stride if b == 0 else 1
            if bottleneck:
                y = jnp.maximum(conv(f"{base}.conv1", a, 1, 0), 0)
                taps[f"b{bi}.c1"] = y
                y = jnp.maximum(conv(f"{base}.conv2", y, st, 1), 0)
                taps[f"b{bi}.c2"] = y
                y = conv(f"{base}.conv3", y, 1, 0)
                taps[f"b{bi}.c3"] = y
            else:
                y = jnp.maximum(conv(f"{base}.conv1", a, st, 1), 0)
                taps[f"b{bi}.c1"] = y
                y = conv(f"{base}.conv2", y, 1, 1)
                taps[f"b{bi}.c2"] = y
            if f"{base}.downsample.0" in params:
                r = conv(f"{base}.downsample.0", a, st, 0)
                taps[f"b{bi}.ds"] = r
            else:
                r = a
            a = jnp.maximum(y + r, 0)
            taps[f"b{bi}.out"] = a
            bi += 1
    a = jnp.mean(a, axis=(2, 3))
    logits = a @ jnp.asarray(params["fc.weight"]).T \
        + jnp.asarray(params["fc.bias"])
    taps["fc_in"] = a
    return logits, taps


def quantize_resnet18(
    params_fp32: Dict[str, np.ndarray],
    calib_x: np.ndarray,
    num_classes: int = 1000,
    small_input: bool = False,
    stages=None,
    bottleneck: bool = False,
    calib_batch_size: Optional[int] = None,
    calib_percentile: Optional[float] = None,
    pow2_input_scale: bool = False,
) -> ResNet18Int8:
    """Fold BN, quantize per-channel INT8, calibrate activation scales.

    ``calib_x``: FP32 NCHW calibration set.  With the default
    ``calib_batch_size=None`` it is traced as one batch; setting a batch
    size streams it in chunks and aggregates per-tap abs-max ranges —
    the reference's N-batch ``calibrate_activations``
    (sw/INT8 quantization/quantize_resnet18.py:163) — so large real
    calibration sets fit in host memory.
    ``calib_percentile`` (e.g. 99.9) clips each tap's range to that
    per-batch |x| percentile (max across batches) instead of the raw
    abs-max, the reference calibrator's outlier-clipping discipline
    (quantize_resnet18.py:103-160); outliers then saturate at +-127.
    ``stages``/``bottleneck`` generalize to the deeper family
    (models/resnet.py); defaults are ResNet-18.
    ``pow2_input_scale`` snaps the INPUT activation scale up to the
    next power of two (epilogue.pow2_scale) — at most one bit of input
    resolution for a provably-exact reciprocal multiply in the fused
    stem's staging quantize (the classic fixed-point-hardware
    calibration constraint; the reference's requant datapath is
    Q16.16, output_accumulator.sv:397-426).  All downstream
    bias/requant constants are derived from the snapped scale, so
    every bit-exactness contract is unchanged.
    """
    stages = STAGES if stages is None else stages
    # ---- 1. fold BN into convs ------------------------------------------
    folded = fold_all_bn(params_fp32, stages=stages,
                         bottleneck=bottleneck)

    # ---- 2. calibrate activation scales ---------------------------------
    calib_x = np.asarray(calib_x, np.float32)
    bs = len(calib_x) if calib_batch_size is None else int(calib_batch_size)
    if bs < 1:
        raise ValueError(f"calib_batch_size must be >= 1, got {bs}")
    maxima: Dict[str, float] = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for i in range(0, len(calib_x), bs):
            _, taps = _float_forward_taps(
                folded, jnp.asarray(calib_x[i:i + bs], jnp.float32),
                small_input, stages=stages, bottleneck=bottleneck)
            for k, v in taps.items():
                av = np.abs(np.asarray(v))
                m = (float(np.percentile(av, calib_percentile))
                     if calib_percentile is not None else float(av.max()))
                maxima[k] = max(maxima.get(k, 0.0), m)

    def scale_from_max(m):
        return max(float(m) / 127.0, 1e-12)

    s_input = scale_from_max(np.abs(calib_x).max())
    if pow2_input_scale:
        from resnet_accel_tpu.ops.epilogue import pow2_scale
        s_input = pow2_scale(s_input)
    s = {k: scale_from_max(m) for k, m in maxima.items()}

    # ---- 3. build quantized layers --------------------------------------
    def qconv(name, s_in, s_out, relu, in_c, k, stride, pad):
        w = folded[name]
        b = folded[name + ".bias"]
        w_q, w_s = quantize_symmetric_per_channel(w, axis=0)
        return QConv(
            w2d=w_q.reshape(w_q.shape[0], -1),
            bias=bias_to_int32(b, s_in, w_s),
            factors=requant_factors(s_in, w_s, s_out),
            in_channels=in_c, kernel=k, stride=stride, padding=pad,
            relu=relu)

    stem_k, stem_s, stem_p = (3, 1, 1) if small_input else (7, 2, 3)
    stem = qconv("conv1", s_input, s["stem"], True, 3, stem_k, stem_s,
                 stem_p)

    blocks: List = []
    bi = 0
    in_c = 64
    s_prev = s["stem"]
    for si, (out_c, nblocks, stride) in enumerate(stages, start=1):
        exp_c = out_c * EXPANSION if bottleneck else out_c
        for b in range(nblocks):
            base = f"layer{si}.{b}"
            st = stride if b == 0 else 1
            c_in = in_c if b == 0 else exp_c
            ds = None
            s_res = s_prev
            if f"{base}.downsample.0" in folded:
                ds = qconv(f"{base}.downsample.0", s_prev, s[f"b{bi}.ds"],
                           False, c_in, 1, st, 0)
                s_res = s[f"b{bi}.ds"]
            if bottleneck:
                conv1 = qconv(f"{base}.conv1", s_prev, s[f"b{bi}.c1"],
                              True, c_in, 1, 1, 0)
                conv2 = qconv(f"{base}.conv2", s[f"b{bi}.c1"],
                              s[f"b{bi}.c2"], True, out_c, 3, st, 1)
                conv3 = qconv(f"{base}.conv3", s[f"b{bi}.c2"],
                              s[f"b{bi}.c3"], False, out_c, 1, 1, 0)
                blocks.append(QBottleneck(
                    conv1=conv1, conv2=conv2, conv3=conv3, downsample=ds,
                    s_in=s_prev, s_main=s[f"b{bi}.c3"], s_res=s_res,
                    s_out=s[f"b{bi}.out"]))
            else:
                conv1 = qconv(f"{base}.conv1", s_prev, s[f"b{bi}.c1"],
                              True, c_in, 3, st, 1)
                conv2 = qconv(f"{base}.conv2", s[f"b{bi}.c1"],
                              s[f"b{bi}.c2"], False, out_c, 3, 1, 1)
                blocks.append(QBlock(
                    conv1=conv1, conv2=conv2, downsample=ds,
                    s_in=s_prev, s_main=s[f"b{bi}.c2"], s_res=s_res,
                    s_out=s[f"b{bi}.out"]))
            s_prev = s[f"b{bi}.out"]
            bi += 1
        in_c = exp_c

    # ---- 4. final FC ------------------------------------------------------
    fc_q, fc_s = quantize_symmetric_per_channel(folded["fc.weight"], axis=0)
    fc_b = bias_to_int32(folded["fc.bias"], s_prev, fc_s)
    fc_deq = (np.float32(s_prev) * fc_s).astype(np.float32)

    return ResNet18Int8(
        stem=stem, blocks=blocks, fc_w=fc_q, fc_b=fc_b, fc_deq=fc_deq,
        s_input=s_input, small_input=small_input, num_classes=num_classes)


def attach_bsr(
    model: ResNet18Int8,
    block: int = 128,
    min_sparsity: float = 0.25,
    chunk: int = 16,
    layer_filter=None,
) -> ResNet18Int8:
    """Attach zero-skip BSR weight streams to layers with enough block
    sparsity (config 5 of the baseline: batched sparse serving).

    Scans each conv's INT8 weight matrix for zero (block x block) tiles
    (e.g. produced by the progressive pruning trainer); layers whose block
    sparsity reaches ``min_sparsity`` get a packed KernelBSR and their
    convs run through the Pallas zero-skip kernel (im2col -> sparse GEMM).
    Dense layers are untouched.  Numerically exact either way.

    ``layer_filter(prefix) -> bool`` limits which layers are converted
    (measured guidance: sparse conv through explicit im2col only beats
    the dense native conv on GEMM-dominant layers — small spatial extent
    or 1x1 kernels; see docs/ARCHITECTURE.md §7).
    """
    def maybe(qc: QConv, prefix: str = "") -> QConv:
        if layer_filter is not None and not layer_filter(prefix):
            return qc
        return _maybe_bsr(qc)

    def _maybe_bsr(qc: QConv) -> QConv:
        bsr = build_bsr_int8_direct(qc.w2d, block)
        if bsr.sparsity_pct / 100.0 < min_sparsity:
            return qc
        return dataclasses.replace(
            qc, bsr=pack_kernel_bsr(bsr, chunk=chunk))

    def convert(blk, i):
        repl = dict(
            conv1=maybe(blk.conv1, f"b{i}.c1"),
            conv2=maybe(blk.conv2, f"b{i}.c2"),
            downsample=(maybe(blk.downsample, f"b{i}.ds")
                        if blk.downsample is not None else None))
        if isinstance(blk, QBottleneck):
            repl["conv3"] = maybe(blk.conv3, f"b{i}.c3")
        return dataclasses.replace(blk, **repl)

    new_blocks = [convert(blk, i) for i, blk in enumerate(model.blocks)]
    return dataclasses.replace(model, stem=maybe(model.stem, "stem"),
                               blocks=new_blocks)


def prune_params_blockwise(
    params_fp32: Dict[str, np.ndarray],
    sparsity: float,
    block: int = 128,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Magnitude block-pruning of conv weights (benchmark helper; the
    real flow is train.blocksparse progressive pruning with fine-tune).

    Prunes each layer's flattened [O, I*kH*kW] weight at (block x block)
    granularity by block L2 norm, keeping the stem dense (its tiny K dim
    leaves nothing to skip)."""
    out = dict(params_fp32)
    for name, w in params_fp32.items():
        if not name.endswith(".weight") or w.ndim != 4:
            continue
        if name == "conv1.weight":
            continue
        w2 = w.reshape(w.shape[0], -1).copy()
        H, W = w2.shape
        ph, pw = -H % block, -W % block
        wp = np.pad(w2, ((0, ph), (0, pw)))
        nbr, nbc = wp.shape[0] // block, wp.shape[1] // block
        t = wp.reshape(nbr, block, nbc, block)
        norms = np.sqrt((t ** 2).sum(axis=(1, 3)))
        n_prune = int(norms.size * sparsity)
        if n_prune == 0:
            continue
        # Exact quota via argsort (a threshold comparison prunes every
        # tied block — all of them when norms are uniform).
        keep = np.ones(norms.size, bool)
        keep[np.argsort(norms.reshape(-1),
                        kind="stable")[:n_prune]] = False
        full = np.repeat(np.repeat(keep.reshape(norms.shape), block, 0),
                         block, 1)
        w2 *= full[:H, :W]
        out[name] = w2.reshape(w.shape).astype(np.float32)
    return out


# ==========================================================================
# TPU forward
# ==========================================================================

def make_forward(model: ResNet18Int8, use_pallas: bool = True,
                 backend: Optional[str] = None,
                 conv_method: str = "native",
                 layout: str = "NCHW",
                 input_layout: str = "NCHW",
                 stem_s2d: bool = True,
                 stem_wh: Optional[bool] = None,
                 stem_nm: Optional[bool] = None,
                 stem_fused: Optional[bool] = None,
                 pm_trunk: Optional[bool] = None,
                 bm_trunk: Optional[bool] = None,
                 conv_routes: Optional[Dict[str, str]] = None,
                 residual_barrier: bool = False,
                 expand_fused: Optional[bool] = None):
    """Build the jit-able batched INT8 forward: fp32 NCHW -> fp32 logits.

    ``layout`` picks the internal activation layout; both are bit-exact
    (the math is layout-independent).  Measured on v5e: NHWC wins on
    isolated early-layer convs (up to 3x) but loses end-to-end (XLA's
    whole-graph layout assignment on the NCHW program beats the
    hand-forced channel-minor pipeline by ~20%), so NCHW is the default.
    Sparse (attach_bsr) layers require NCHW.

    ``conv_routes`` overrides the compute route per layer prefix (e.g.
    ``{"b0.c1": "bf16", "b1.c2": "nhwc"}``); routes are "native" (int8
    NCHW conv), "bf16" (exact small-K bf16 MXU conv, ops/conv.py), or
    "nhwc" (channel-minor conv with local transposes — consecutive nhwc
    layers' transposes cancel under XLA).  All routes are bit-exact; the
    default None means measured per-layer defaults (tools/route_tune.py).
    ``{"stem": "fused-stacked"}`` routes the fused stem kernel through
    its row-stacked M=128 dots (ops/stem_fused.py ``stacked``;
    pending on-chip A/B vs the round-4 M=64 default).
    ``{"stem_quant": "div"|"inv"|"auto"}`` picks the fused stem's
    staging-quantize op: ``auto`` (default) multiplies by the exact
    reciprocal when the input scale is a power of two
    (epilogue.exact_pow2_inv — bit-identical by construction) and
    divides otherwise.

    ``input_layout="CHWN"`` takes the input as [3, H, W, N] — the
    batch-minor layout the fused stem stages from natively, so the
    XLA transpose+pad pre-op disappears (pad-free kernel schedule;
    bit-exact, measured ~110 us at batch 128 —
    tools/stem_stage_probe.py / stem_padfree_ab.py).  Production
    ingest controls its own upload layout, so this is free at the
    host boundary; non-fused fallback paths transpose back to NCHW
    internally (correct for every geometry, pays one copy).
    ``residual_barrier`` puts an optimization barrier between each block's
    convs and its residual add, keeping the add out of the conv fusion.

    ``bm_trunk`` (default: on for the TPU backend) runs the 64-channel
    basic blocks after the fused stem as batch-minor Mosaic convs
    (ops/conv_bm.py): the stem emits row-vector activations, each
    block's residual join fuses into its c2 epilogue, and the run's
    last conv writes the XLA-consumable per-q-slice layout.  Bit-exact
    (tests/test_conv_bm.py); measured on chip in
    tools/conv_bm_probe.py / route_tune.py.

    ``expand_fused`` routes each bottleneck's c3 expansion AND its
    residual join through the one-pass Pallas kernel
    (ops/expand_fused.py) — XLA's own conv+add fusion runs at ~2x its
    bandwidth floor there (measured, -50 batch 128).  None auto-enables
    on the TPU backend at the throughput geometry (batch % 128, dense
    c3, stride 1); per-layer opt-out via ``conv_routes[f"b{i}.c3"] =
    "native"``.  Bit-exact (tests/test_expand_fused.py)."""
    if (layout == "NHWC" and conv_method == "native"
            and not any(qc.bsr is not None
                        for _, qc in model.named_convs())
            and not any(isinstance(b, QBottleneck)
                        for b in model.blocks)):
        return _make_forward_nhwc(model, use_pallas, backend,
                                  stem_s2d=stem_s2d)

    # Space-to-depth stem (the MLPerf ResNet trick): the 7x7/s2/p3 conv
    # on 3 channels maps the MXU badly; regrouped by 2x2 pixel parity it
    # becomes a 4x4/s1 conv on 12 channels at half the spatial size —
    # bit-identical (stem_s2d_weights pads with structural zeros).
    use_s2d = (stem_s2d and model.stem.bsr is None
               and conv_method == "native"
               and model.stem.kernel == 7 and model.stem.stride == 2
               and model.stem.padding == 3)

    # WH pipeline: the fused quantize+s2d Pallas kernel emits the s2d
    # planes with TRANSPOSED spatial axes (ops.stem_pack._kernel_wh's
    # sublane-bitcast parity split — one HBM pass instead of XLA's
    # quantize fusion + two serial layout copies, ~330 us -> ~130 us at
    # batch 128).  Every op after the stem is spatially symmetric, so
    # the whole trunk runs on (W, H) arrays with each conv's taps
    # transposed — logits bit-identical (tested vs the standard path).
    # Sparse (BSR) layers pack their K-order from the untransposed taps,
    # so any attached BSR disables the WH route.  ``stem_wh=None`` auto-
    # enables on the TPU backend (on CPU the kernel's interpret fallback
    # is the plain composition — correct but no faster, so default off
    # there; tests force it on to cover the WH trunk hermetically).
    # NM (batch-minor) pipeline, the successor to WH: the fused
    # quantize+s2d kernel runs on a [C, H, W, N] view of the input and
    # emits [H/2, W/2, C*4, N] — on TPU both views are free relayouts
    # (XLA's auto entry layout is batch-minor, and the emitted bytes are
    # exactly the conv emitter's wanted {0,1,3,2} activation layout),
    # killing the ~246 us of stem relayout copies the WH kernel forced
    # at batch 128 while keeping the trunk UNTRANSPOSED — so it also
    # composes with BSR-sparse layers.  ``stem_nm=None`` auto-enables
    # on the TPU backend unless WH was explicitly requested.
    # Residual-join requant: use the verified-reciprocal multiply where
    # the exhaustive per-block proof holds (ops/epilogue.py) — the f32
    # divide is the most expensive VPU op in the fused conv+add
    # epilogues (the residual joins run ~2x their bandwidth floor with
    # it; measured, docs/ARCHITECTURE.md).
    inv_of = [exact_inv_out_scale(b.s_main, b.s_res, b.s_out)
              for b in model.blocks]

    on_tpu = backend_mod.resolve_backend(backend) == "tpu"
    if stem_nm is None:
        stem_nm = on_tpu and stem_wh is not True
    use_nm = use_s2d and stem_nm
    if stem_wh is None:
        stem_wh = on_tpu
    use_wh = (use_s2d and stem_wh
              and not any(qc.bsr is not None
                          for _, qc in model.named_convs()))
    # Fused stem complex (ops/stem_fused.py): quantize + s2d + 4x4 conv
    # + 3x3/s2 maxpool + requant in ONE Pallas pass — the pre-pool
    # activation never touches HBM and the batch-minor GEMMs run all
    # 128 MXU lanes where XLA's emitter caps at C_out=64.  Bit-exact
    # (tests/test_stem_fused.py + on-chip check).  Auto-enables on the
    # TPU backend at the throughput geometry (batch % 128, relu stem).
    if stem_fused is None:
        stem_fused = on_tpu
    use_fused = (use_s2d and stem_fused and model.stem.relu
                 and not model.small_input)
    # Measured OFF by default: the fused kernel is element-exact on chip
    # but the residual-join epilogue is VPU-throughput-bound (~2.2-2.5
    # f32 Tops/s effective, measured three independent ways), so XLA's
    # own conv+add fusion already sits near the achievable floor — and a
    # mid-trunk custom call additionally forces relayout copies on its
    # operands (consumer-driven layout assignment).  In-model at batch
    # 128: 7948 -> 11500 us.  Kept as the measured verdict + the
    # bit-exact capability (tools/expand_fused_check.py).
    if expand_fused is None:
        expand_fused = False
    use_expand = expand_fused
    interp = backend_mod.interpret_mode(backend)


    def run_stem_s2d(params, qc: QConv, x, mode: str):
        with jax.named_scope("stem"):
            if mode == "nm":
                s = quantize_s2d_nm(x, model.s_input,
                                    interpret=interp)   # fp32 in
                w = stem_s2d_weights(params["stem.w"], qc.in_channels, 7)
            elif mode == "wh":
                s = quantize_s2d_wh(x, model.s_input,
                                    interpret=interp)   # fp32 in
                w = transpose_taps(
                    stem_s2d_weights(params["stem.w"], qc.in_channels, 7),
                    4 * qc.in_channels, 4)
            else:
                s = space_to_depth_nchw(x)              # int8 in
                w = stem_s2d_weights(params["stem.w"], qc.in_channels, 7)
            s_method = ("bf16" if (conv_routes or {}).get("stem") == "bf16"
                        else "native")
            return conv2d_int8(
                s, w, bias=params["stem.b"],
                kernel=4, stride=1, padding=((2, 1), (2, 1)),
                factors=params["stem.f"], relu=qc.relu,
                use_pallas=use_pallas, backend=backend, method=s_method)

    def run_conv(params, prefix, qc: QConv, x, wh: bool = False):
        with jax.named_scope(prefix):
            return _run_conv(params, prefix, qc, x, wh)

    def _run_conv(params, prefix, qc: QConv, x, wh: bool = False):
        if qc.bsr is not None and use_pallas:
            # Sparse layer: im2col -> zero-skip BSR GEMM with the fused
            # bias/ReLU/requant epilogue.
            N, _, H, W = x.shape
            H_out = (H + 2 * qc.padding - qc.kernel) // qc.stride + 1
            W_out = (W + 2 * qc.padding - qc.kernel) // qc.stride + 1
            patches = im2col_nchw(x, qc.kernel, qc.stride, qc.padding)
            a2 = patches.reshape(N * H_out * W_out, -1)
            kb = dataclasses.replace(
                qc.bsr,
                blocks=params[f"{prefix}.bsr.blocks"],
                col_of=params[f"{prefix}.bsr.col"],
                row_of=params[f"{prefix}.bsr.row"],
                first_of=params[f"{prefix}.bsr.first"],
                last_of=params[f"{prefix}.bsr.last"])
            out = bsr_matmul_wt(
                a2, kb, bias=params[f"{prefix}.b"],
                factors=params[f"{prefix}.f"], relu=qc.relu,
                backend=backend)
            out = out.reshape(N, H_out, W_out, -1)
            return out.transpose(0, 3, 1, 2)
        w2d = params[f"{prefix}.w"]
        if wh and qc.kernel > 1:
            w2d = transpose_taps(w2d, qc.in_channels, qc.kernel)
        route = (conv_routes or {}).get(prefix, "native")
        if route in ("nhwcb", "nativeb"):
            # Barrier-forced variants: opt barriers pin the layout hand-
            # off so XLA can't canonicalize the route back into the
            # surrounding program (plain per-layer "nhwc" compiles to
            # the bit-identical program — measured, tools/route_tune.py)
            # and can't fuse the conv with its neighbours.  Probes for
            # the deep-conv layout anomaly (3x3 512ch @ 7x7 runs 4x
            # slower inside -50 than the identical shape inside -18).
            if route == "nhwcb":
                w_hwio = w2d.reshape(-1, qc.in_channels, qc.kernel,
                                     qc.kernel).transpose(2, 3, 1, 0)
                xt = jax.lax.optimization_barrier(
                    x.transpose(0, 2, 3, 1))
                y = conv2d_int8_nhwc(
                    xt, w_hwio, bias=params[f"{prefix}.b"],
                    stride=qc.stride, padding=qc.padding,
                    factors=params[f"{prefix}.f"], relu=qc.relu)
                return jax.lax.optimization_barrier(y).transpose(
                    0, 3, 1, 2)
            xb = jax.lax.optimization_barrier(x)
            y = conv2d_int8(
                xb, w2d, bias=params[f"{prefix}.b"],
                kernel=qc.kernel, stride=qc.stride, padding=qc.padding,
                factors=params[f"{prefix}.f"], relu=qc.relu,
                use_pallas=use_pallas, backend=backend,
                method=conv_method)
            return jax.lax.optimization_barrier(y)
        if route == "nhwc":
            w_hwio = w2d.reshape(-1, qc.in_channels,
                                 qc.kernel, qc.kernel).transpose(2, 3, 1, 0)
            y = conv2d_int8_nhwc(
                x.transpose(0, 2, 3, 1), w_hwio,
                bias=params[f"{prefix}.b"], stride=qc.stride,
                padding=qc.padding, factors=params[f"{prefix}.f"],
                relu=qc.relu)
            return y.transpose(0, 3, 1, 2)
        method = (route if route in ("bf16", "im2col")
                  else conv_method)
        return conv2d_int8(
            x, w2d, bias=params[f"{prefix}.b"],
            kernel=qc.kernel, stride=qc.stride, padding=qc.padding,
            factors=params[f"{prefix}.f"], relu=qc.relu,
            use_pallas=use_pallas, backend=backend, method=method)

    # Pixel-major pair-plane trunk (ops/conv_pm.py): identity basic
    # blocks whose two 3x3/s1/p1 convs have C_in = C_out <= 64 run as
    # fused Pallas kernels over parity-split [H/2, C, W*N] planes —
    # all 128 MXU output lanes live where XLA's conv emitter caps at
    # C_out of 128 (the measured 64-channel conv ceiling,
    # docs/ARCHITECTURE.md §7).  Consecutive eligible blocks chain in
    # plane layout with zero relayouts; conv2 fuses the residual add.
    # ``pm_trunk=None`` currently means OFF everywhere: the v1 kernel
    # measured slower than XLA's conv in context and v2's on-chip
    # measurement is pending (tools/pm_bench.py) — flip this default
    # to the TPU backend once v2 measures faster.
    if pm_trunk is None:
        pm_trunk = False
    use_pm = pm_trunk and use_pallas and conv_method == "native"

    # Batch-minor stage-1 trunk (ops/conv_bm.py): the 64-channel basic
    # blocks after the fused stem run as Mosaic ring-staged convs on
    # row-vector activations, with each block's residual join fused
    # into its c2 epilogue — no merges, no relayouts; the run's last
    # conv writes the XLA-consumable per-q-slice layout.  Bit-exact
    # (tests/test_conv_bm.py; on-chip tools/conv_bm_probe.py).
    if bm_trunk is None:
        bm_trunk = on_tpu

    def _bm_block_ok(blk):
        if not isinstance(blk, QBlock):
            return False
        for qc in (blk.conv1, blk.conv2):
            if (qc.bsr is not None or qc.kernel != 3 or qc.stride != 1
                    or qc.padding != 1 or qc.in_channels != 64
                    or qc.w2d.shape[0] != 64):
                return False
        return (blk.downsample is None and blk.conv1.relu
                and not blk.conv2.relu)

    bm_prefix = 0
    if bm_trunk and use_fused and not use_pm:
        for blk in model.blocks:
            if not _bm_block_ok(blk):
                break
            bm_prefix += 1
    _PM_MAX_C = 64

    def _pm_block_ok(blk) -> bool:
        if not isinstance(blk, QBlock) or blk.downsample is not None:
            return False
        for qc in (blk.conv1, blk.conv2):
            c = qc.in_channels
            if (qc.bsr is not None or qc.kernel != 3 or qc.stride != 1
                    or qc.padding != 1 or c > _PM_MAX_C
                    or qc.w2d.shape[0] != c):
                return False
        return True

    def run_block_pm(params, i, blk, planes, wh, n):
        def g_of(prefix, qc):
            w2d = params[f"{prefix}.w"]
            if wh:
                w2d = transpose_taps(w2d, qc.in_channels, qc.kernel)
            return conv_pm.pack_g3_pair_jnp(w2d, qc.in_channels)

        with jax.named_scope(f"b{i}.c1pm"):
            ye = conv_pm.conv3x3_pm2(
                planes[0], planes[1], g_of(f"b{i}.c1", blk.conv1),
                params[f"b{i}.c1.b"], params[f"b{i}.c1.f"], n=n,
                relu=blk.conv1.relu, interpret=interp)
        with jax.named_scope(f"b{i}.c2pm"):
            return conv_pm.conv3x3_pm2(
                ye[0], ye[1], g_of(f"b{i}.c2", blk.conv2),
                params[f"b{i}.c2.b"], params[f"b{i}.c2.f"], n=n,
                relu=blk.conv2.relu, residual=planes,
                res_scales=(blk.s_main, blk.s_res, blk.s_out),
                interpret=interp)

    def forward(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
        chwn = input_layout == "CHWN"
        if chwn:
            _, Hx, Wx, Nx = x.shape
        else:
            Nx, _, Hx, Wx = x.shape
        s2d_ok = use_s2d and Hx % 2 == 0 and Wx % 2 == 0
        fused = (use_fused and x.dtype != jnp.int8
                 and Nx > 0 and Nx % 128 == 0
                 and Hx % 4 == 0 and Wx % 4 == 0
                 and (conv_routes or {}).get("stem") != "bf16")
        if fused:
            stacked_route = ((conv_routes or {}).get("stem")
                             == "fused-stacked")
            bm_run = bm_prefix if not stacked_route else 0
            with jax.named_scope("stem.fused"):
                from resnet_accel_tpu.ops.stem_fused import \
                    stem_conv_pool_nm
                w = stem_s2d_weights(params["stem.w"],
                                     model.stem.in_channels, 7)
                a = stem_conv_pool_nm(
                    x, w, params["stem.b"], params["stem.f"],
                    model.s_input, interpret=interp,
                    stacked=stacked_route,
                    input_layout=input_layout,
                    out_layout="rowvec" if bm_run else "nchw",
                    quant_mode=(conv_routes or {}).get("stem_quant",
                                                       "auto"))
            if not bm_run:
                return _trunk(params, a)
            # ---- batch-minor stage-1 run -----------------------------
            from resnet_accel_tpu.ops import conv_bm
            W_bm = a.shape[2] // Nx          # pooled width
            # default split (two kernels per block): the whole-block
            # fused kernel measures a statistical tie (500/504 us vs
            # 195+305 split, tools/route_tune.py bmsplit) — the HBM
            # round-trips it removes were already hidden under compute
            # — so the simpler form ships and the block kernel stays
            # behind {"bm": "block"} for future hardware
            # default: stacked row-pair dots — measured on chip (round
            # 5, route_tune bmstacked): c1 195 -> ~140, c2 307 -> ~257,
            # device total 2628 -> 2505 us, logit-exact.  "split" =
            # the 9-dot M=64 form; "block" = the whole-block fusion
            # (measured tie); both kept for A/B and odd-H geometries.
            bm_route = (conv_routes or {}).get("bm")
            bm_block = bm_route == "block"
            bm_stacked = (bm_route in (None, "stacked")
                          and a.shape[0] % 2 == 0)
            for i in range(bm_run):
                blk = model.blocks[i]
                last = i == bm_run - 1
                out_l = "qslice" if last else "rowvec"
                rs = (blk.s_main, blk.s_res, blk.s_out, inv_of[i])
                if bm_stacked:
                    # row-pair M=128 dots (A/B route; see conv_bm)
                    w31 = conv_bm.pack_weights_bm_stacked(
                        params[f"b{i}.c1.w"], 64)
                    w32 = conv_bm.pack_weights_bm_stacked(
                        params[f"b{i}.c2.w"], 64)
                    with jax.named_scope(f"b{i}.c1bms"):
                        y = conv_bm.conv3x3_bm_stacked(
                            a, w31, params[f"b{i}.c1.b"],
                            params[f"b{i}.c1.f"], width=W_bm,
                            relu=True, kernel_interpret=interp)
                    with jax.named_scope(f"b{i}.c2bms"):
                        a = conv_bm.conv3x3_bm_stacked(
                            y, w32, params[f"b{i}.c2.b"],
                            params[f"b{i}.c2.f"], width=W_bm,
                            relu=True, residual=a, res_scales=rs,
                            out_layout=out_l, kernel_interpret=interp)
                    continue
                w91 = conv_bm.pack_weights_bm(params[f"b{i}.c1.w"], 64)
                w92 = conv_bm.pack_weights_bm(params[f"b{i}.c2.w"], 64)
                if bm_block:
                    # whole block in one pass: c1's activation stays in
                    # VMEM, the residual is re-read from the input ring
                    with jax.named_scope(f"b{i}.bm"):
                        a = conv_bm.block3x3_bm(
                            a, w91, params[f"b{i}.c1.b"],
                            params[f"b{i}.c1.f"], w92,
                            params[f"b{i}.c2.b"], params[f"b{i}.c2.f"],
                            width=W_bm, res_scales=rs, out_layout=out_l,
                            kernel_interpret=interp)
                    continue
                with jax.named_scope(f"b{i}.c1bm"):
                    y = conv_bm.conv3x3_bm(
                        a, w91, params[f"b{i}.c1.b"],
                        params[f"b{i}.c1.f"], width=W_bm, relu=True,
                        kernel_interpret=interp)
                with jax.named_scope(f"b{i}.c2bm"):
                    a = conv_bm.conv3x3_bm(
                        y, w92, params[f"b{i}.c2.b"],
                        params[f"b{i}.c2.f"], width=W_bm, relu=True,
                        residual=a, res_scales=rs, out_layout=out_l,
                        kernel_interpret=interp)
            # qslice (H', W', C, N) -> NCHW view, batch-minor physical
            return _trunk(params, a.transpose(3, 2, 0, 1),
                          start=bm_run)
        if chwn:
            x = x.transpose(3, 0, 1, 2)       # fallback paths are NCHW
        # nm needs full 128 lanes (its kernel gate); wh covers the rest.
        nm = (use_nm and s2d_ok and x.dtype != jnp.int8
              and (interp or (x.shape[0] > 0 and x.shape[0] % 128 == 0)))
        wh = use_wh and s2d_ok and x.dtype != jnp.int8 and not nm
        if nm or wh:
            # quantize fuses into the s2d kernel: fp32 straight in
            a = run_stem_s2d(params, model.stem, x, "nm" if nm else "wh")
        else:
            a = x if x.dtype == jnp.int8 \
                else quantize_input(x, model.s_input)
            a = run_stem_s2d(params, model.stem, a, "std") if s2d_ok \
                else run_conv(params, "stem", model.stem, a)
        if not model.small_input:
            with jax.named_scope("stem.pool"):
                a = maxpool2d_int8(a, 3, 2, padding=1)
        return _trunk(params, a, wh)

    def _trunk(params: Dict[str, jnp.ndarray], a: jnp.ndarray,
               wh: bool = False, start: int = 0):
        planes = None  # (even, odd) pm planes while inside a pm run
        for i, blk in enumerate(model.blocks[start:], start=start):
            pm_ok = (use_pm and _pm_block_ok(blk)
                     and a.shape[0] % 128 == 0 and a.shape[2] % 2 == 0)
            if pm_ok:
                if planes is None:
                    with jax.named_scope("pm.enter"):
                        planes = conv_pm.to_pm_planes(a)
                planes = run_block_pm(params, i, blk, planes, wh,
                                      a.shape[0])
                with jax.named_scope(f"b{i}.exitpm"):
                    # NCHW view kept for the next block's shape checks;
                    # dead code (XLA DCE) while the pm run continues.
                    a = conv_pm.from_pm_planes(planes[0], planes[1],
                                               a.shape[0])
                continue
            if planes is not None:
                planes = None  # `a` already holds the NCHW view
            y = run_conv(params, f"b{i}.c1", blk.conv1, a, wh)
            y = run_conv(params, f"b{i}.c2", blk.conv2, y, wh)
            if (isinstance(blk, QBottleneck) and use_expand
                    and blk.conv3.bsr is None and blk.conv3.stride == 1
                    and a.shape[0] % 128 == 0
                    and (conv_routes or {}).get(f"b{i}.c3") != "native"):
                r = run_conv(params, f"b{i}.ds", blk.downsample, a, wh) \
                    if blk.downsample is not None else a
                with jax.named_scope(f"b{i}.c3"):
                    a = expand_add_int8(
                        y, params[f"b{i}.c3.w"], params[f"b{i}.c3.b"],
                        params[f"b{i}.c3.f"], r, blk.s_main, blk.s_res,
                        blk.s_out, inv_out=inv_of[i], interpret=interp)
                continue
            if isinstance(blk, QBottleneck):
                y = run_conv(params, f"b{i}.c3", blk.conv3, y, wh)
            r = run_conv(params, f"b{i}.ds", blk.downsample, a, wh) \
                if blk.downsample is not None else a
            with jax.named_scope(f"b{i}.add"):
                if residual_barrier:
                    # Keep the dequant-add-requant out of the conv's output
                    # fusion: fused, the f32 add epilogue throttles the MXU
                    # (measured +100 us on the 64-ch convs at batch 128).
                    y, r = jax.lax.optimization_barrier((y, r))
                a = add_residual(y, r, blk.s_main, blk.s_res, blk.s_out,
                                 relu=True, inv_out_scale=inv_of[i])
        with jax.named_scope("avgpool"):
            a = avgpool_global_int8(a)
        with jax.named_scope("fc"):
            acc = matmul_int8(a, params["fc.w"], bias=params["fc.b"],
                              use_pallas=use_pallas, backend=backend)
            return acc.astype(jnp.float32) * params["fc.deq"][None, :]

    return forward


def _make_forward_nhwc(model: ResNet18Int8, use_pallas: bool,
                       backend: Optional[str], stem_s2d: bool = False):
    """Channel-minor pipeline: one transpose at entry, none after."""
    inv_of = [exact_inv_out_scale(b.s_main, b.s_res, b.s_out)
              for b in model.blocks]

    def run_conv(params, prefix, qc: QConv, x):
        with jax.named_scope(prefix):
            return conv2d_int8_nhwc(
                x, params[f"{prefix}.whwio"], bias=params[f"{prefix}.b"],
                stride=qc.stride, padding=qc.padding,
                factors=params[f"{prefix}.f"], relu=qc.relu)

    use_s2d = (stem_s2d and model.stem.kernel == 7
               and model.stem.stride == 2 and model.stem.padding == 3)

    def run_stem_s2d(params, qc: QConv, x):
        with jax.named_scope("stem"):
            C, O = qc.in_channels, qc.w2d.shape[0]
            w = stem_s2d_weights(params["stem.w"], C, 7)
            whwio = w.reshape(O, C * 4, 4, 4).transpose(2, 3, 1, 0)
            return conv2d_int8_nhwc(
                space_to_depth_nhwc(x), whwio, bias=params["stem.b"],
                stride=1,
                padding=((2, 1), (2, 1)), factors=params["stem.f"],
                relu=qc.relu)

    def forward(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
        with jax.named_scope("quantize"):
            a = x if x.dtype == jnp.int8 \
                else quantize_input(x, model.s_input)
            a = jnp.transpose(a, (0, 2, 3, 1))
        if use_s2d and a.shape[1] % 2 == 0 and a.shape[2] % 2 == 0:
            a = run_stem_s2d(params, model.stem, a)
        else:
            a = run_conv(params, "stem", model.stem, a)
        if not model.small_input:
            with jax.named_scope("stem.pool"):
                a = maxpool2d_int8_nhwc(a, 3, 2, padding=1)
        for i, blk in enumerate(model.blocks):
            y = run_conv(params, f"b{i}.c1", blk.conv1, a)
            y = run_conv(params, f"b{i}.c2", blk.conv2, y)
            r = run_conv(params, f"b{i}.ds", blk.downsample, a) \
                if blk.downsample is not None else a
            with jax.named_scope(f"b{i}.add"):
                a = add_residual(y, r, blk.s_main, blk.s_res, blk.s_out,
                                 relu=True, inv_out_scale=inv_of[i])
        with jax.named_scope("avgpool"):
            a = avgpool_global_int8_nhwc(a)
        with jax.named_scope("fc"):
            acc = matmul_int8(a, params["fc.w"], bias=params["fc.b"],
                              use_pallas=use_pallas, backend=backend)
            return acc.astype(jnp.float32) * params["fc.deq"][None, :]

    return forward


# ==========================================================================
# Golden forward (numpy, per-sample) — bit-exactness oracle
# ==========================================================================

def _g_requant(acc, factors, relu):
    acc = acc.astype(np.int64)
    if relu:
        acc = np.maximum(acc, 0)
    scaled = acc.astype(np.int32).astype(np.float32) * factors
    return np.clip(np.rint(scaled), -128, 127).astype(np.int8)


def _g_conv(qc: QConv, x):
    acc = golden.conv2d_int8_im2col(
        x, qc.w2d, qc.bias, qc.in_channels, qc.kernel, qc.stride,
        qc.padding)
    return _g_requant(acc, qc.factors[:, None, None], qc.relu)


def forward_golden(model: ResNet18Int8, x: np.ndarray) -> np.ndarray:
    """Pure-numpy golden forward (per sample)."""
    s0 = model.s_input
    xq = np.clip(np.rint(x.astype(np.float32) / np.float32(s0)),
                 -128, 127).astype(np.int8)
    logits = np.empty((x.shape[0], model.num_classes), np.float32)
    for n in range(x.shape[0]):
        a = _g_conv(model.stem, xq[n])
        if not model.small_input:
            a = golden.maxpool2d_int8(a, 3, 2, padding=1)
        for blk in model.blocks:
            y = _g_conv(blk.conv1, a)
            y = _g_conv(blk.conv2, y)
            if isinstance(blk, QBottleneck):
                y = _g_conv(blk.conv3, y)
            r = _g_conv(blk.downsample, a) if blk.downsample is not None \
                else a
            s = (y.astype(np.float32) * np.float32(blk.s_main)
                 + r.astype(np.float32) * np.float32(blk.s_res))
            q = np.rint(s / np.float32(blk.s_out))
            q = np.clip(q, -128, 127)
            a = np.maximum(q, 0).astype(np.int8)
        a = golden.avgpool_global_int8(a).reshape(1, -1)
        acc = golden.matmul_int8(a, model.fc_w.T).astype(np.int64) \
            + model.fc_b[None, :]
        logits[n] = acc.astype(np.int32).astype(np.float32) \
            * model.fc_deq[None, :]
    return logits
