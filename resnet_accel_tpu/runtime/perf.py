"""Performance counters and metrics — PerfCounters/PerfMetrics parity.

The reference counts cycles in hardware (hw/rtl/monitor/perf.sv:83,
non-intrusive total/active/idle, latched on done) and derives utilization,
GOPS, latency, bandwidth and operational intensity
(hw/sim/cpp/include/performance_counters.hpp:51-95).  The TPU equivalent
measures wall-clock around dispatches and derives the same fields against
the chip's roofline.

TPU v5e single-chip roofline constants (public figures):
    peak INT8  ~394 TOPS, peak BF16 ~197 TFLOPS, HBM ~819 GB/s.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, Optional

import jax


@dataclasses.dataclass(frozen=True)
class Platform:
    """Single-chip roofline constants for one TPU generation.

    The platform scaling table of the reference
    (performance_config.hpp:53-172: PYNQ-Z2 → ZCU104 → ZCU102 → Alveo U50),
    re-cast over TPU generations.  All values are public per-chip figures.
    """

    name: str
    peak_int8_ops: float     # ops/s (int8 MXU peak; = bf16 where no 2x)
    peak_bf16_flops: float   # flops/s
    hbm_bytes_per_s: float
    hbm_bytes: float

    @property
    def ridge_ops_per_byte(self) -> float:
        return self.peak_int8_ops / self.hbm_bytes_per_s


#: TPU platform scaling table (per chip, public figures).
PLATFORMS: Dict[str, Platform] = {
    "v4": Platform("v4", 275e12, 275e12, 1228e9, 32 * 2**30),
    "v5e": Platform("v5e", 394e12, 197e12, 819e9, 16 * 2**30),
    "v5p": Platform("v5p", 918e12, 459e12, 2765e9, 95 * 2**30),
    "v6e": Platform("v6e", 1836e12, 918e12, 1640e9, 32 * 2**30),
}


def get_platform(name: Optional[str] = None) -> Platform:
    """Select roofline constants; env RESNET_ACCEL_TPU_PLATFORM overrides,
    default v5e (the chip this framework is benchmarked on)."""
    key = (name or os.environ.get("RESNET_ACCEL_TPU_PLATFORM", "v5e")).lower()
    if key not in PLATFORMS:
        raise ValueError(
            f"unknown platform {key!r}; known: {sorted(PLATFORMS)}")
    return PLATFORMS[key]


#: Back-compat module constants (the v5e row).
PEAK_INT8_OPS = PLATFORMS["v5e"].peak_int8_ops
PEAK_BF16_FLOPS = PLATFORMS["v5e"].peak_bf16_flops
HBM_BYTES_PER_S = PLATFORMS["v5e"].hbm_bytes_per_s


@dataclasses.dataclass
class PerfMetrics:
    """Derived metrics for one measured region (PerfMetrics parity)."""

    name: str
    latency_s: float
    total_ops: int
    bytes_accessed: int
    iters: int = 1
    platform: Platform = dataclasses.field(
        default_factory=get_platform)

    @property
    def gops(self) -> float:
        return self.total_ops / self.latency_s / 1e9 if self.latency_s else 0.0

    @property
    def utilization(self) -> float:
        """Fraction of the chip's INT8 peak achieved (MXU utilization)."""
        return self.total_ops / self.latency_s / self.platform.peak_int8_ops \
            if self.latency_s else 0.0

    @property
    def bandwidth_gbs(self) -> float:
        return self.bytes_accessed / self.latency_s / 1e9 \
            if self.latency_s else 0.0

    @property
    def operational_intensity(self) -> float:
        """ops/byte — roofline x-coordinate."""
        return self.total_ops / self.bytes_accessed \
            if self.bytes_accessed else 0.0

    @property
    def roofline_bound(self) -> str:
        """'compute' or 'memory' per the platform's roofline ridge point."""
        ridge = self.platform.ridge_ops_per_byte
        return "compute" if self.operational_intensity >= ridge else "memory"

    def report(self) -> str:
        """Human-readable report (print_performance_report parity)."""
        return (
            f"[{self.name}] {self.latency_s * 1e6:.0f} us | "
            f"{self.gops:.1f} GOPS | util {self.utilization * 100:.1f}% | "
            f"{self.bandwidth_gbs:.1f} GB/s | "
            f"OI {self.operational_intensity:.1f} ops/B "
            f"({self.roofline_bound}-bound)")


class PerfTimer:
    """Measure a jitted callable like the hardware perf block measures a
    layer: warm up (compile), then time N dispatches, latch best/mean."""

    def __init__(self, warmup: int = 1, iters: int = 10):
        self.warmup = warmup
        self.iters = iters

    def measure(
        self,
        name: str,
        fn: Callable,
        *args,
        total_ops: int = 0,
        bytes_accessed: int = 0,
    ) -> PerfMetrics:
        for _ in range(self.warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(self.iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return PerfMetrics(name=name, latency_s=best, total_ops=total_ops,
                           bytes_accessed=bytes_accessed, iters=self.iters)


class LayerProfiler:
    """Collect per-layer PerfMetrics across a model run (the CSR perf
    register readout loop of accel.py get_performance_stats)."""

    def __init__(self):
        self.records: List[PerfMetrics] = []

    def add(self, m: PerfMetrics) -> None:
        self.records.append(m)

    def summary(self) -> Dict[str, float]:
        total_t = sum(r.latency_s for r in self.records)
        total_ops = sum(r.total_ops for r in self.records)
        return {
            "total_latency_s": total_t,
            "total_ops": total_ops,
            "overall_gops": total_ops / total_t / 1e9 if total_t else 0.0,
            "layers": len(self.records),
        }

    def report(self) -> str:
        lines = [r.report() for r in self.records]
        s = self.summary()
        lines.append(
            f"[total] {s['total_latency_s'] * 1e6:.0f} us | "
            f"{s['overall_gops']:.1f} GOPS over {s['layers']} layers")
        return "\n".join(lines)


def measure_chained(
    fn: Callable,
    x,
    feedback: Callable,
    outer: int = 5,
    chain: int = 16,
    reps: int = 4,
) -> float:
    """True per-call kernel time on high-dispatch-latency environments.

    Remote/tunneled TPUs add ~1 ms per dispatch, swamping fast kernels.
    This chains ``chain`` data-dependent calls inside one jitted loop body
    (``feedback(prev_input, output) -> next_input`` forces the dependency
    so XLA cannot hoist or overlap) and subtracts the 1-call body:

        t_kernel = (T(chain) - T(1)) / (chain - 1)

    Returns seconds per call.
    """
    import jax

    def make(k):
        @jax.jit
        def loop(a0):
            def body(i, a):
                for _ in range(k):
                    a = feedback(a, fn(a))
                return a
            return jax.lax.fori_loop(0, outer, body, a0)

        r = loop(x)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = loop(x)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / outer)
        return best

    t1, tk = make(1), make(chain)
    return max((tk - t1) / (chain - 1), 1e-9)


def trace_profile(fn: Callable, *args, logdir: str = "/tmp/rat_trace"):
    """Capture a jax.profiler trace around one dispatch (VCD-waveform
    analog; inspect with TensorBoard/xprof)."""
    with jax.profiler.trace(logdir):
        out = fn(*args)
        jax.block_until_ready(out)
    return logdir


def median_pair_time(l1: Callable, lc: Callable, x, chain: int,
                     iters: int = 9, strict: bool = False) -> float:
    """Median-of-pairs chained timing: seconds per call.

    ``l1``/``lc`` are compiled callables running 1 and ``chain``
    dependent calls; each iteration times both back to back and
    subtracts, so slow tunnel drift between separately-timed phases
    cannot masquerade as kernel time.  The median is taken over ALL
    pairs (including negative jitter artifacts — censoring only one
    tail would bias the estimate).

    A non-positive median means jitter swamped the differencing; the
    measurement retries with more pairs, and if it stays non-positive
    falls back to the raw chained time ``(t_chain / chain)`` — a
    strictly positive upper bound (it includes per-dispatch overhead)
    so a loaded CPU (e.g. ``pytest -n 8``) degrades accuracy instead
    of crashing the benchmark.  ``strict=True`` restores the raise.
    """
    if chain < 2:
        raise ValueError(f"chain must be >= 2, got {chain}")
    import numpy as np

    pairs: list = []
    raw: list = []
    for attempt in range(3):
        for _ in range(max(iters, 3)):
            t0 = time.perf_counter()
            jax.block_until_ready(l1(x))
            t1 = time.perf_counter()
            jax.block_until_ready(lc(x))
            t2 = time.perf_counter()
            pairs.append(((t2 - t1) - (t1 - t0)) / (chain - 1))
            raw.append((t2 - t1) / chain)
        med = float(np.median(pairs))
        if med > 0:
            return med
    if strict:
        raise RuntimeError(
            f"non-positive chained median over {len(pairs)} pairs; "
            "dispatch jitter swamped the measurement — re-run")
    return float(np.median(raw))
