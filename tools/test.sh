#!/usr/bin/env bash
# Local CI runner (reference tools/test.sh parity): python suite + native
# C++ build/tests + CLI smoke.  Hermetic: CPU backend only.
set -euo pipefail
cd "$(dirname "$0")/.."

export RESNET_ACCEL_TPU_BACKEND=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

echo "== native build + C++ tests =="
make -C native test

echo "== python test suite =="
python -m pytest tests/ -q

echo "== CLI smoke =="
python -m resnet_accel_tpu fixtures --output /tmp/rat_ci_fixtures >/dev/null
python -m resnet_accel_tpu sim \
  --artifact /tmp/rat_ci_fixtures/mlp/fc_512_128 \
  --output /tmp/rat_ci_g1.npy >/dev/null
./native/build/rat_tool golden \
  --artifact /tmp/rat_ci_fixtures/mlp/fc_512_128 --bh 8 --bw 8 \
  --output /tmp/rat_ci_g2.npy >/dev/null
python -m resnet_accel_tpu verify \
  --golden /tmp/rat_ci_g1.npy --actual /tmp/rat_ci_g2.npy

echo "== multichip dry run =="
python __graft_entry__.py 8 >/dev/null

echo "== chipless AOT compile check (Mosaic lowering + VMEM budgets) =="
python tools/aot_check.py

echo "== power telemetry source scan =="
# Re-probe every CI run so a real watts source (hwmon rail, libtpu
# metrics service) flips the power model off `modeled` the day the
# environment grows one.  CPU-pinned + hard timeout: the probe must
# never hang CI on a dead TPU tunnel.
timeout 60 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -c "
from resnet_accel_tpu.runtime.power import probe_live_telemetry
import json; print(json.dumps(probe_live_telemetry()))" \
  || echo '{\"probe\": \"timed out\"}'

echo "ALL CI CHECKS PASSED"
