"""Power / energy accounting — the reference's power_profiling role on TPU.

The reference samples the Zynq XADC rails live (sw/host/power_profiling.py:
VCCINT/VCCAUX/VCCBRAM + temperature -> avg/peak mW, energy mJ, GOPS/W).
A tunneled TPU exposes no userspace power telemetry, so this module keeps
the same report shape with MODELED power: published chip TDP prorated by
measured duty cycle (MXU utilization), clearly labeled as an estimate.
When live telemetry is available (e.g. via a cloud-monitoring agent), feed
measured watts into PowerProfile directly — the report math is shared.
"""

from __future__ import annotations

import dataclasses

#: Published peak/idle power envelope for a TPU v5e chip.
TPU_V5E_TDP_W = 170.0
TPU_V5E_IDLE_W = 60.0


@dataclasses.dataclass
class PowerProfile:
    """Power/energy summary for one measured region.

    Same fields as the reference's PowerProfile (power_profiling.py:33-100)
    — avg/peak watts, energy, GOPS/W — with ``modeled`` marking estimates.
    """

    name: str
    duration_s: float
    avg_w: float
    peak_w: float
    total_ops: int = 0
    modeled: bool = True

    @property
    def energy_j(self) -> float:
        return self.avg_w * self.duration_s

    @property
    def energy_mj(self) -> float:
        return self.energy_j * 1e3

    @property
    def gops_per_w(self) -> float:
        if not self.duration_s or not self.avg_w:
            return 0.0
        return (self.total_ops / self.duration_s / 1e9) / self.avg_w

    def report(self) -> str:
        tag = " (modeled)" if self.modeled else ""
        return (f"[{self.name}] {self.avg_w:.1f} W avg / "
                f"{self.peak_w:.1f} W peak{tag} | "
                f"{self.energy_mj:.1f} mJ | "
                f"{self.gops_per_w:.1f} GOPS/W")


def probe_live_telemetry() -> dict:
    """Attempt every telemetry source this environment could expose;
    return {source_name: status}.  The reference reads real XADC rails
    (power_profiling.py:33-100); on a TPU host the candidates are:

    - ``jax.Device.memory_stats()`` — HBM occupancy (not power, but the
      only per-device counter the PJRT client exports);
    - ``/sys/class/hwmon`` — kernel hwmon rails (present on GCE TPU VMs
      with the TPU driver; absent behind the axon tunnel);
    - the ``tpu-info``/libtpu gRPC metrics service on localhost:8431
      (``tpu.monitoring.runtime`` — power/duty-cycle/HBM gauges).

    Probed on this image (2026-08): all three absent — the chip sits
    behind a tunnel, so the host has no /dev/accel, no hwmon rails and
    no local metrics server, and ``memory_stats()`` returns None.
    estimate_power's modeled numbers (clearly labeled) remain the
    honest fallback; callers can re-run this probe and switch
    ``modeled=False`` when a source appears.
    """
    import glob
    import os
    import socket

    status = {}
    try:
        import jax
        ms = jax.devices()[0].memory_stats()
        status["pjrt_memory_stats"] = (
            "available" if isinstance(ms, dict) and ms else "none")
    except Exception as e:  # no device at all
        status["pjrt_memory_stats"] = f"error: {e}"
    rails = []
    if os.path.isdir("/sys/class/hwmon"):
        for p in glob.glob("/sys/class/hwmon/hwmon*/name"):
            try:  # device may vanish / be unreadable between glob+open
                with open(p) as f:
                    if "tpu" in f.read().lower():
                        rails.append(p)
            except OSError:
                continue
    status["hwmon_rails"] = rails or "none"
    try:
        with socket.create_connection(("127.0.0.1", 8431), timeout=0.2):
            status["libtpu_metrics_8431"] = "listening"
    except OSError:
        status["libtpu_metrics_8431"] = "none"
    return status


def estimate_power(
    name: str,
    duration_s: float,
    total_ops: int,
    utilization: float,
    tdp_w: float = TPU_V5E_TDP_W,
    idle_w: float = TPU_V5E_IDLE_W,
) -> PowerProfile:
    """Model chip power as idle + utilization * (TDP - idle).

    ``utilization`` is the measured fraction of int8 peak
    (runtime.perf.PerfMetrics.utilization).
    """
    u = min(max(utilization, 0.0), 1.0)
    avg = idle_w + u * (tdp_w - idle_w)
    return PowerProfile(name=name, duration_s=duration_s, avg_w=avg,
                        peak_w=tdp_w if u > 0 else idle_w,
                        total_ops=total_ops, modeled=True)
