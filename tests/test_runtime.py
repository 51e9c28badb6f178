"""Runtime engine + perf tests (SoftwareModelBackend pattern: no TPU)."""

import numpy as np
import pytest

from resnet_accel_tpu.models.resnet18 import (
    init_resnet18_fp32,
    quantize_resnet18,
    make_forward,
)
from resnet_accel_tpu.runtime import (
    InferenceEngine,
    AcceleratorError,
    AccelErrorCode,
    preprocess_imagenet,
    preprocess_mnist,
    softmax,
    top_k,
    PerfMetrics,
    PerfTimer,
)


@pytest.fixture(scope="module")
def engine():
    params = init_resnet18_fp32(seed=0, num_classes=10, small_input=True)
    rng = np.random.default_rng(1)
    calib = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet18(params, calib, 10, small_input=True)
    return InferenceEngine(model, make_forward, backend="cpu")


class TestEngine:
    def test_run_inference(self, engine):
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (3, 3, 32, 32)).astype(np.float32)
        res = engine.run_inference(x)
        assert res.logits.shape == (3, 10)
        assert res.predictions.shape == (3,)
        assert len(res.top5) == 3 and len(res.top5[0]) == 5
        # top5 probabilities sorted descending
        probs = [p for _, p in res.top5[0]]
        assert probs == sorted(probs, reverse=True)
        assert res.images_per_s > 0

    def test_bake_weights_identical(self, engine):
        # Weight-stationary compilation (weights as program constants)
        # must be a pure performance choice: logits identical.
        baked = InferenceEngine(engine.model, make_forward, backend="cpu",
                                bake_weights=True)
        rng = np.random.default_rng(7)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        np.testing.assert_array_equal(
            baked.run_inference(x).logits, engine.run_inference(x).logits)

    def test_invalid_input_shape(self, engine):
        with pytest.raises(AcceleratorError) as ei:
            engine.run_inference(np.zeros((3, 32, 32), np.float32))
        assert ei.value.code == AccelErrorCode.INVALID_CONFIG

    def test_verify_accuracy_runs(self, engine):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (4, 3, 32, 32)).astype(np.float32)
        acc = engine.verify_accuracy(x, [0, 1, 2, 3])
        assert 0.0 <= acc <= 1.0

    def test_benchmark(self, engine):
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        m = engine.benchmark(x, iters=2)
        assert m.latency_s > 0

    def test_deterministic_across_calls(self, engine):
        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        a = engine.run_inference(x).logits
        b = engine.run_inference(x).logits
        np.testing.assert_array_equal(a, b)


class TestPreprocess:
    def test_imagenet(self):
        img = np.full((1, 224, 224, 3), 128, np.uint8)
        x = preprocess_imagenet(img)
        assert x.shape == (1, 3, 224, 224)
        expected = (128 / 255.0 - 0.485) / 0.229
        assert abs(x[0, 0, 0, 0] - expected) < 1e-6

    def test_mnist(self):
        img = np.zeros((2, 28, 28), np.uint8)
        x = preprocess_mnist(img)
        assert x.shape == (2, 1, 28, 28)
        assert abs(x[0, 0, 0, 0] - (-0.1307 / 0.3081)) < 1e-4


class TestSoftmaxTopK:
    def test_softmax_sums_to_one(self):
        logits = np.array([[1.0, 2.0, 3.0]], np.float32)
        p = softmax(logits)
        assert abs(p.sum() - 1.0) < 1e-6
        assert p.argmax() == 2

    def test_top_k(self):
        logits = np.array([[0.1, 5.0, 2.0, -1.0]], np.float32)
        t = top_k(logits, k=2)
        assert t[0][0][0] == 1 and t[0][1][0] == 2


class TestPerf:
    def test_metrics_fields(self):
        m = PerfMetrics("x", latency_s=1e-3, total_ops=2 * 10**9,
                        bytes_accessed=10**6)
        assert abs(m.gops - 2000) < 1e-6
        assert 0 < m.utilization < 1
        assert m.operational_intensity == 2000.0
        assert m.roofline_bound == "compute"
        assert "GOPS" in m.report()

    def test_memory_bound_detection(self):
        m = PerfMetrics("y", latency_s=1e-3, total_ops=10**6,
                        bytes_accessed=10**8)
        assert m.roofline_bound == "memory"

    def test_platform_table(self):
        # The platform scaling table (performance_config.hpp:53-172 role):
        # the same measurement grades differently against each roofline.
        from resnet_accel_tpu.runtime import PLATFORMS, get_platform
        import pytest as _pytest
        assert get_platform().name == "v5e"
        assert get_platform("v6e").peak_int8_ops \
            > get_platform("v5e").peak_int8_ops
        assert set(PLATFORMS) == {"v4", "v5e", "v5p", "v6e"}
        m_v5e = PerfMetrics("x", latency_s=1e-3, total_ops=10**11,
                            bytes_accessed=10**6,
                            platform=get_platform("v5e"))
        m_v6e = PerfMetrics("x", latency_s=1e-3, total_ops=10**11,
                            bytes_accessed=10**6,
                            platform=get_platform("v6e"))
        assert m_v5e.utilization > m_v6e.utilization
        with _pytest.raises(ValueError):
            get_platform("v99")

    def test_platform_env_override(self, monkeypatch):
        from resnet_accel_tpu.runtime import get_platform
        monkeypatch.setenv("RESNET_ACCEL_TPU_PLATFORM", "v5p")
        assert get_platform().name == "v5p"

    def test_perf_timer(self):
        import jax.numpy as jnp
        timer = PerfTimer(warmup=1, iters=2)
        m = timer.measure("add", lambda a: a + 1, jnp.zeros((8, 8)),
                          total_ops=64)
        assert m.latency_s > 0


class TestPower:
    def test_modeled_profile_math(self):
        from resnet_accel_tpu.runtime.power import (
            PowerProfile, estimate_power, TPU_V5E_IDLE_W, TPU_V5E_TDP_W)
        p = estimate_power("fc1", duration_s=0.5, total_ops=10**11,
                           utilization=0.5)
        assert p.modeled
        assert p.avg_w == TPU_V5E_IDLE_W + 0.5 * (TPU_V5E_TDP_W
                                                  - TPU_V5E_IDLE_W)
        assert p.peak_w == TPU_V5E_TDP_W
        assert abs(p.energy_j - p.avg_w * 0.5) < 1e-9
        assert p.gops_per_w > 0
        assert "(modeled)" in p.report()
        live = PowerProfile("x", 1.0, 100.0, 120.0, modeled=False)
        assert "(modeled)" not in live.report()

    def test_idle_utilization_clamps(self):
        from resnet_accel_tpu.runtime.power import (estimate_power,
                                                    TPU_V5E_IDLE_W)
        p = estimate_power("idle", 1.0, 0, utilization=-3.0)
        assert p.avg_w == TPU_V5E_IDLE_W and p.peak_w == TPU_V5E_IDLE_W

    def test_live_telemetry_probe_reports_sources(self):
        from resnet_accel_tpu.runtime.power import probe_live_telemetry
        status = probe_live_telemetry()
        # every candidate source is probed and reported, found or not
        assert set(status) == {"pjrt_memory_stats", "hwmon_rails",
                               "libtpu_metrics_8431"}
        for v in status.values():
            assert v  # a status string/list, never empty
