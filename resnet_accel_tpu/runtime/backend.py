"""Backend seam — the dependency-injection point for "which device runs it".

The reference's AXIBackend abstraction (hw/sim/cpp/include/axi_master.hpp:
44,125,230,341) let the same driver run against real FPGA /dev/mem, a
Verilator co-sim, or a pure software model.  The TPU-native equivalent:

- ``tpu``    — real TPU chip(s): compiled Pallas kernels + XLA.
- ``cpu``    — JAX CPU backend; Pallas kernels run in interpret mode.
               (the "SoftwareModelBackend": identical test harnesses, no HW)
- ``golden`` — pure numpy golden models (bit-exactness oracle).

Selection: explicit argument > RESNET_ACCEL_TPU_BACKEND env var > first
available accelerator.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax


VALID_BACKENDS = ("tpu", "cpu", "golden")


@functools.lru_cache(maxsize=None)
def drop_tunnel_backend() -> None:
    """Unregister the tunnel-backed TPU plugin for a CPU-ONLY process.

    jax initializes every registered platform on the first backends()
    call, so even a CPU-pinned run dials the TPU tunnel once at startup
    — and blocks forever in a GIL-holding C call if the tunnel endpoint
    is down (observed).  Call this ONLY when the whole process is
    CPU-only by intent (hermetic tests, dryruns, CPU-pinned CLI runs):
    it is process-wide and irreversible — a later backend="tpu" in the
    same process would silently get CPU.  resolve_backend() therefore
    does NOT call it; entry points that know the user's intent do
    (tests/conftest.py, __graft_entry__.dryrun_multichip,
    tools/aot_check.py, the CLI on an explicit non-TPU backend).
    No-op after any backend initialized, and under a plain CPU install
    (no plugin registered)."""
    try:
        from jax._src import xla_bridge as _xb

        if not _xb._backend_factories.get("axon"):
            return
        if _xb._backends:  # some backend already initialized — too late
            return
        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # jax internals moved — degrade to the old risk
        pass


def resolve_backend(backend: Optional[str] = None) -> str:
    """Resolve the effective backend name.  Side-effect free."""
    b = backend or os.environ.get("RESNET_ACCEL_TPU_BACKEND")
    if b is None:
        b = "tpu" if _accelerator_available() else "cpu"
    if b not in VALID_BACKENDS:
        raise ValueError(f"unknown backend {b!r}; expected {VALID_BACKENDS}")
    return b


@functools.lru_cache(maxsize=None)
def _accelerator_available() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def interpret_mode(backend: Optional[str] = None) -> bool:
    """True when Pallas kernels must run in interpreter mode (no TPU)."""
    return resolve_backend(backend) != "tpu"


def default_device(backend: Optional[str] = None):
    """The jax.Device computations should target for this backend."""
    b = resolve_backend(backend)
    if b == "cpu":
        return jax.devices("cpu")[0]
    return jax.devices()[0]
