"""Runtime: inference engine, backend seam, performance metrics."""

from resnet_accel_tpu.runtime.backend import (
    resolve_backend,
    interpret_mode,
    default_device,
)
from resnet_accel_tpu.runtime.engine import (
    InferenceEngine,
    InferenceResult,
    StreamResult,
    AcceleratorError,
    AccelErrorCode,
    preprocess_imagenet,
    preprocess_mnist,
    softmax,
    top_k,
)
from resnet_accel_tpu.runtime.paged import PagedKVBatcher
from resnet_accel_tpu.runtime.serving import ContinuousBatcher
from resnet_accel_tpu.runtime.perf import (
    PerfMetrics,
    PerfTimer,
    LayerProfiler,
    Platform,
    PLATFORMS,
    get_platform,
    trace_profile,
)

__all__ = [
    "ContinuousBatcher",
    "PagedKVBatcher",
    "resolve_backend",
    "interpret_mode",
    "default_device",
    "InferenceEngine",
    "InferenceResult",
    "StreamResult",
    "AcceleratorError",
    "AccelErrorCode",
    "preprocess_imagenet",
    "preprocess_mnist",
    "softmax",
    "top_k",
    "PerfMetrics",
    "PerfTimer",
    "Platform",
    "PLATFORMS",
    "get_platform",
    "LayerProfiler",
    "trace_profile",
]
