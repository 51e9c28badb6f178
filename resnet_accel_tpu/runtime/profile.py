"""Per-layer model profiling — the reference's per-layer perf-counter table.

The reference reads hardware counters per layer (perf.sv latched at done,
PerfCounters::read per run_layer).  On a jitted TPU program individual
layers aren't separately timeable without perturbing the schedule, so the
profiler combines:

- static per-layer analysis: exact MACs/ops and HBM bytes from the layer
  geometry (the same numbers the reference derives from DIMS/TILES), with
  roofline classification (compute- vs memory-bound on v5e), and
- one measured end-to-end latency, distributed over layers in proportion
  to their roofline-predicted times, reported alongside the analytic
  bound so regressions are visible per layer.

Output: a LayerProfiler filled with PerfMetrics rows + a printable table.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from resnet_accel_tpu.runtime.perf import (
    HBM_BYTES_PER_S,
    LayerProfiler,
    PEAK_INT8_OPS,
    PerfMetrics,
)


def _conv_geometry(qc, h: int, w: int) -> Tuple[int, int, int, int]:
    """Returns (H_out, W_out, macs, bytes) for one conv layer at HxW."""
    ho = (h + 2 * qc.padding - qc.kernel) // qc.stride + 1
    wo = (w + 2 * qc.padding - qc.kernel) // qc.stride + 1
    o = qc.w2d.shape[0]
    patch = qc.w2d.shape[1]
    macs = ho * wo * o * patch
    bytes_ = (h * w * qc.in_channels          # input int8
              + o * patch                      # weights int8
              + ho * wo * o)                   # output int8
    return ho, wo, macs, bytes_


def profile_resnet18(
    model,
    input_hw: Optional[int] = None,
    batch: int = 1,
    measured_latency_s: Optional[float] = None,
) -> LayerProfiler:
    """Build the per-layer profile of a (quantized) ResNet18Int8.

    ``measured_latency_s``: an end-to-end measurement (e.g. from
    InferenceEngine.benchmark) distributed over layers by predicted
    share; without it, layers carry their roofline-predicted latency.
    """
    if input_hw is None:
        input_hw = 32 if model.small_input else 224
    prof = LayerProfiler()
    rows: List[Tuple[str, int, int]] = []  # (name, macs, bytes)

    h = w = input_hw
    ho, wo, macs, byt = _conv_geometry(model.stem, h, w)
    rows.append(("stem", macs, byt))
    h, w = ho, wo
    if not model.small_input:
        h, w = (h + 2 * 1 - 3) // 2 + 1, (w + 2 * 1 - 3) // 2 + 1

    for i, blk in enumerate(model.blocks):
        ho, wo, macs, byt = _conv_geometry(blk.conv1, h, w)
        rows.append((f"b{i}.c1", macs, byt))
        ho, wo, macs2, byt2 = _conv_geometry(blk.conv2, ho, wo)
        rows.append((f"b{i}.c2", macs2, byt2))
        if hasattr(blk, "conv3"):  # bottleneck (stride sits on conv2)
            ho, wo, macs3, byt3 = _conv_geometry(blk.conv3, ho, wo)
            rows.append((f"b{i}.c3", macs3, byt3))
        if blk.downsample is not None:
            _, _, macsd, bytd = _conv_geometry(blk.downsample, h, w)
            rows.append((f"b{i}.ds", macsd, bytd))
        h, w = ho, wo

    n_cls, feat = model.fc_w.shape
    rows.append(("fc", feat * n_cls, feat * n_cls + feat + n_cls))

    # Roofline-predicted per-layer time at batch size.
    preds = []
    for name, macs, byt in rows:
        ops = 2 * macs * batch
        byts = byt * batch
        t_pred = max(ops / PEAK_INT8_OPS, byts / HBM_BYTES_PER_S)
        preds.append(t_pred)
    total_pred = sum(preds)

    scale = (measured_latency_s / total_pred
             if measured_latency_s else 1.0)
    for (name, macs, byt), t_pred in zip(rows, preds):
        prof.add(PerfMetrics(
            name=name,
            latency_s=t_pred * scale,
            total_ops=2 * macs * batch,
            bytes_accessed=byt * batch))
    return prof


def profile_table(prof: LayerProfiler) -> str:
    """Fixed-width per-layer table (print_performance_report parity)."""
    lines = [f"{'layer':10s} {'us':>9s} {'GOPS':>9s} {'util%':>7s} "
             f"{'GB/s':>8s} {'bound':>8s}"]
    for r in prof.records:
        lines.append(
            f"{r.name:10s} {r.latency_s * 1e6:9.1f} {r.gops:9.1f} "
            f"{r.utilization * 100:7.2f} {r.bandwidth_gbs:8.1f} "
            f"{r.roofline_bound:>8s}")
    s = prof.summary()
    lines.append(f"{'TOTAL':10s} {s['total_latency_s'] * 1e6:9.1f} "
                 f"{s['overall_gops']:9.1f}")
    return "\n".join(lines)
