"""Per-layer profiler tests."""

import numpy as np
import pytest

from resnet_accel_tpu.models.resnet18 import (
    init_resnet18_fp32,
    quantize_resnet18,
)
from resnet_accel_tpu.runtime.profile import profile_resnet18, profile_table


@pytest.fixture(scope="module")
def model():
    params = init_resnet18_fp32(seed=0, num_classes=1000,
                                small_input=False)
    rng = np.random.default_rng(0)
    calib = rng.normal(0, 1, (1, 3, 224, 224)).astype(np.float32)
    return quantize_resnet18(params, calib, 1000, small_input=False)


class TestProfile:
    def test_layer_count_and_total_macs(self, model):
        prof = profile_resnet18(model, batch=1)
        # 1 stem + 16 block convs + 3 downsamples + 1 fc = 21 layers,
        # the reference's 21-layer table (resnet_inference.hpp:121).
        assert len(prof.records) == 21
        total_macs = sum(r.total_ops for r in prof.records) // 2
        # ResNet-18 @224 is ~1.82 GMACs/image (DEEP_DIVE.md:247-263).
        assert 1.6e9 < total_macs < 2.0e9, total_macs

    def test_measured_latency_distributes(self, model):
        prof = profile_resnet18(model, batch=8,
                                measured_latency_s=8e-3)
        total = sum(r.latency_s for r in prof.records)
        assert abs(total - 8e-3) < 1e-9

    def test_bound_classification_varies(self, model):
        prof = profile_resnet18(model, batch=32)
        bounds = {r.roofline_bound for r in prof.records}
        # large-batch convs are compute-bound, fc at batch 32 memory-bound
        assert bounds == {"compute", "memory"}

    def test_table_renders(self, model):
        prof = profile_resnet18(model, batch=1)
        table = profile_table(prof)
        assert "stem" in table and "TOTAL" in table and "bound" in table
        assert len(table.splitlines()) == 23


class TestMedianPairTime:
    def test_basic_and_validation(self):
        import pytest

        from resnet_accel_tpu.runtime.perf import median_pair_time

        import numpy as np

        class _Arr:  # minimal block_until_ready target
            def block_until_ready(self):
                return self

        import time as _t

        # Deterministic accuracy check: drive the measurement with a
        # scripted clock instead of real sleeps (real sleeps overshoot
        # unboundedly on a loaded CPU and flaked the suite).  Each
        # iteration reads perf_counter three times: t0, t1=t0+1ms,
        # t2=t1+9ms -> pair = (9ms - 1ms)/(chain-1) = 1ms exactly.
        from unittest import mock

        ticks = iter(
            base + off for base in range(1000) for off in (0.0, 0.001, 0.010)
        )
        with mock.patch(
            "resnet_accel_tpu.runtime.perf.time"
        ) as fake_time:
            fake_time.perf_counter.side_effect = lambda: next(ticks)

            def l1(x):
                return np.zeros(1)

            def lc(x):
                return np.zeros(1)

            dt = median_pair_time(l1, lc, None, chain=9, iters=3)
            assert abs(dt - 0.001) < 1e-12, dt

        def l1(x):
            return np.zeros(1)

        def lc(x):
            return np.zeros(1)

        with pytest.raises(ValueError, match="chain"):
            median_pair_time(l1, lc, None, chain=1)

        def fast(x):
            return np.zeros(1)

        def slow_first(x):
            _t.sleep(0.005); return np.zeros(1)

        # Degenerate measurement (chained run faster than single run):
        # strict mode raises; default mode falls back to the raw chained
        # time, which is always positive.
        with pytest.raises(RuntimeError, match="non-positive"):
            median_pair_time(slow_first, fast, None, chain=16, iters=3,
                             strict=True)
        dt = median_pair_time(slow_first, fast, None, chain=16, iters=3)
        assert dt > 0
