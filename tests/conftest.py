"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference tests its driver against a SoftwareModelBackend with no RTL
(hw/sim/cpp/tests/test_virtual_layer.cpp) — the same pattern here: JAX CPU
backend + Pallas interpret mode stand in for real TPU hardware, and an
8-device virtual CPU platform stands in for a multi-chip mesh.
"""

import os
import sys

# Must be set before jax initializes its backends.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


# Pin ALL jax computation in the test process to the CPU backend, even when
# a TPU plugin is registered (the axon plugin ignores JAX_PLATFORMS).  This
# covers both the Pallas interpret flag (via RESNET_ACCEL_TPU_BACKEND) and
# the XLA default device — otherwise every jnp op would compile over the
# TPU tunnel, which is slow and non-hermetic.
os.environ["RESNET_ACCEL_TPU_BACKEND"] = "cpu"

# Stronger than pinning the default device: UNREGISTER the tunnel-backed
# TPU plugin before any backend initializes.  jax initializes every
# registered platform on the first backends() call, so a merely-pinned
# suite still dials the TPU tunnel once at startup — and hangs forever in
# make_c_api_client if the tunnel endpoint is down (observed: a wedged
# claim blocks even pure-CPU jnp ops).  The suite is CPU-hermetic by
# design; dropping the factory removes the tunnel as a failure mode.
from resnet_accel_tpu.runtime.backend import drop_tunnel_backend  # noqa: E402

drop_tunnel_backend()
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:  # no cpu backend registered — leave default
    pass


@pytest.fixture(autouse=True)
def _default_to_cpu(monkeypatch):
    """Keep the software-model seam pinned per-test as well."""
    monkeypatch.setenv("RESNET_ACCEL_TPU_BACKEND", "cpu")
    yield


REFERENCE_DATA = "/root/reference/data"


def has_reference_data() -> bool:
    return os.path.isdir(REFERENCE_DATA)


requires_reference_data = pytest.mark.skipif(
    not has_reference_data(), reason="reference data fixtures not mounted"
)
