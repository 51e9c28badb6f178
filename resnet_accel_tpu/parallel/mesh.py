"""Device mesh construction for multi-chip scaling.

The reference is a single-accelerator system; its v3.0 wish list names
multi-accelerator scaling (docs/architecture/ARCHITECTURE.md:655-657).
On TPU this is native: a jax.sharding.Mesh over ICI with named axes —
``dp`` (data/batch parallel) and ``tp`` (tensor parallel over output
features).  XLA inserts the collectives (all-reduce for dp gradient sums,
all-gather/reduce-scatter for tp) automatically from sharding
annotations; they ride ICI, no host involvement.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def available_devices(prefer_cpu_virtual: bool = False):
    """Devices for mesh building.  With ``prefer_cpu_virtual``, use the
    virtual CPU platform (for multi-chip dry runs on one host)."""
    if prefer_cpu_virtual:
        try:
            return jax.devices("cpu")
        except RuntimeError:
            pass
    return jax.devices()


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh.  dp defaults to n_devices // tp."""
    devices = list(devices if devices is not None else available_devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, "
                         f"have {n}")
    arr = np.array(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [out_features, ...] weight's rows over tp."""
    return NamedSharding(mesh, P("tp"))
