"""ResNet family (18/34/50/101/152) INT8 inference — depth dispatch.

Beyond-parity extension of the reference's single ResNet-18 table
(hw/sim/cpp/include/resnet_inference.hpp:121-133): the same fused
conv-BN-ReLU-requant machinery, residual semantics, and zero-skip BSR
routing generalized over torchvision's stage plans.  Depths 18/34 use
basic blocks; 50/101/152 use bottlenecks (1x1 -> 3x3 -> 1x1, expansion
4).  ``attach_bsr`` can route any layer (incl. the 1x1s) through the
zero-skip kernel — bit-exact — but measured on v5e the 1x1 convs at
ImageNet spatial sizes are activation-traffic-bound like the 3x3s
(routed-sparse e2e 0.23x dense at 70% block sparsity), so the dense
native conv stays the default; zero-skip wins remain on the
weight-dominated GEMM layers (FC, attention projections).  See
docs/ARCHITECTURE.md §7.

Everything returns the same ``ResNet18Int8`` container (blocks may be
``QBlock`` or ``QBottleneck``), so ``make_forward``, ``attach_bsr``,
``forward_golden``, the engine, and the profiler all work unchanged.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from resnet_accel_tpu.models.resnet18 import (
    BOTTLENECK_DEPTHS,
    STAGE_PLANS,
    ResNet18Int8,
    init_resnet18_fp32,
    quantize_resnet18,
)


def _plan(depth: int):
    if depth not in STAGE_PLANS:
        raise ValueError(
            f"unsupported depth {depth}; choose {sorted(STAGE_PLANS)}")
    return STAGE_PLANS[depth], depth in BOTTLENECK_DEPTHS


def init_resnet_fp32(
    depth: int = 18, seed: int = 0, num_classes: int = 1000,
    small_input: bool = False,
) -> Dict[str, np.ndarray]:
    """He-init FP32 parameters for any family depth (torchvision names)."""
    stages, bottleneck = _plan(depth)
    return init_resnet18_fp32(
        seed=seed, num_classes=num_classes, small_input=small_input,
        stages=stages, bottleneck=bottleneck)


def quantize_resnet(
    params_fp32: Dict[str, np.ndarray],
    calib_x: np.ndarray,
    depth: int = 18,
    num_classes: int = 1000,
    small_input: bool = False,
) -> ResNet18Int8:
    """Fold BN + per-channel INT8 PTQ + activation calibration for any
    family depth; returns the standard model container."""
    stages, bottleneck = _plan(depth)
    return quantize_resnet18(
        params_fp32, calib_x, num_classes=num_classes,
        small_input=small_input, stages=stages, bottleneck=bottleneck)
