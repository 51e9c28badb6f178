"""Activation calibration — range observation over calibration batches.

Functional JAX-friendly re-design of the reference's hook-based
``ActivationCalibrator`` (sw/INT8 quantization/quantize_resnet18.py:103-160):
instead of torch forward hooks mutating collector state, the model's
forward returns its intermediate activations (taps), and the calibrator
folds per-tap min/max/absmax across batches.  Same outputs: per-tap ranges
and symmetric INT8 scales.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, Mapping

import numpy as np

from resnet_accel_tpu.config import SCALE_EPS


@dataclasses.dataclass
class TapRange:
    """Observed range for one activation tap.

    ``percentile`` (e.g. 99.9) enables clipped calibration: the range is
    the max over batches of each batch's |x| percentile instead of the
    raw abs-max, so one outlier activation does not blow up the scale
    (the reference clips the same way in its ActivationCalibrator,
    sw/INT8 quantization/quantize_resnet18.py:103-160).  Values past the
    clip saturate at +-127 in the requant path by construction.
    """

    min: float = float("inf")
    max: float = float("-inf")
    absmax: float = 0.0
    batches: int = 0
    percentile: float = None  # None => pure abs-max
    clipped: float = 0.0      # max over batches of per-batch percentile

    def update(self, x: np.ndarray) -> None:
        x = np.asarray(x)
        self.min = min(self.min, float(x.min()))
        self.max = max(self.max, float(x.max()))
        ax = np.abs(x)
        self.absmax = max(self.absmax, float(ax.max()))
        if self.percentile is not None:
            self.clipped = max(
                self.clipped, float(np.percentile(ax, self.percentile)))
        self.batches += 1

    @property
    def symmetric_scale(self) -> float:
        """Symmetric per-tensor INT8 scale (quantize.py:55 formula)."""
        rng = self.clipped if self.percentile is not None else self.absmax
        return max(rng / 127.0, SCALE_EPS)

    @property
    def asymmetric_scale_zp(self):
        scale = max((self.max - self.min) / 255.0, SCALE_EPS)
        zp = int(np.rint(-self.min / scale))
        return scale, zp


class ActivationCalibrator:
    """Fold activation ranges over calibration batches.

    Usage:
        calib = ActivationCalibrator()
        for batch in loader:
            taps = model_forward_with_taps(params, batch)  # {name: array}
            calib.observe(taps)
        scales = calib.scales()
    """

    def __init__(self, percentile: float = None) -> None:
        self.percentile = percentile
        self.ranges: Dict[str, TapRange] = {}

    def observe(self, taps: Mapping[str, np.ndarray]) -> None:
        for name, act in taps.items():
            self.ranges.setdefault(
                name, TapRange(percentile=self.percentile),
            ).update(np.asarray(act))

    def scales(self) -> Dict[str, float]:
        """Symmetric per-tensor INT8 scale per tap."""
        return {k: r.symmetric_scale for k, r in self.ranges.items()}

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"min": r.min, "max": r.max, "absmax": r.absmax,
                "batches": r.batches, "scale": r.symmetric_scale}
            for k, r in self.ranges.items()
        }


def calibrate(
    forward_with_taps: Callable[[np.ndarray], Mapping[str, np.ndarray]],
    batches: Iterable[np.ndarray],
    max_batches: int = 32,
) -> ActivationCalibrator:
    """Run ``forward_with_taps`` over up to ``max_batches`` batches.

    Parity with calibrate_activations (quantize_resnet18.py:163).
    """
    calib = ActivationCalibrator()
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        calib.observe(forward_with_taps(batch))
    return calib
