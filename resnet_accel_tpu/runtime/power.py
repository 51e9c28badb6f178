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
