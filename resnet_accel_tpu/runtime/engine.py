"""Inference engine — the working realization of the reference's
ResNetInference / AcceleratorDriver APIs.

Reference parity (hw/sim/cpp/include/resnet_inference.hpp:180-300,
accelerator_driver.hpp:406-639):
- load_model / run_inference / benchmark / verify_accuracy /
  get_model_sparsity, softmax + top-k, ImageNet & MNIST preprocessing
- typed errors + timeout wrapper (the driver's wait_done/timeout path)
- the AXIBackend seam becomes the backend argument (tpu / cpu / golden)

Where the reference's run_inference was a stub returning class 281
(resnet_inference.cpp:210-246), this one runs the real network.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu.runtime import backend as backend_mod
from resnet_accel_tpu.runtime.perf import LayerProfiler, PerfMetrics


class AccelErrorCode(enum.Enum):
    """Typed error codes (AcceleratorError parity,
    accelerator_driver.hpp:335-352)."""

    INVALID_CONFIG = "invalid_config"
    TIMEOUT = "timeout"
    BACKEND_UNAVAILABLE = "backend_unavailable"
    MODEL_NOT_LOADED = "model_not_loaded"


class AcceleratorError(RuntimeError):
    def __init__(self, code: AccelErrorCode, msg: str):
        super().__init__(f"[{code.value}] {msg}")
        self.code = code


# ImageNet preprocessing constants (resnet_inference.cpp:180).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_imagenet(images_u8: np.ndarray) -> np.ndarray:
    """[N, H, W, 3] uint8 -> normalized [N, 3, H, W] float32."""
    x = images_u8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.ascontiguousarray(x.transpose(0, 3, 1, 2))


def preprocess_mnist(images_u8: np.ndarray) -> np.ndarray:
    """[N, 28, 28] uint8 -> normalized [N, 1, 28, 28] float32."""
    x = images_u8.astype(np.float32) / 255.0
    x = (x - 0.1307) / 0.3081
    return x.reshape(-1, 1, 28, 28)


def softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def top_k(logits: np.ndarray, k: int = 5) -> List[List[Tuple[int, float]]]:
    """Per-sample [(class, prob)] best-first (resnet_inference softmax+topk)."""
    probs = softmax(logits)
    idx = np.argsort(-probs, axis=-1)[:, :k]
    return [[(int(i), float(probs[n, i])) for i in idx[n]]
            for n in range(logits.shape[0])]


@dataclasses.dataclass
class InferenceResult:
    """run_inference output (InferenceResult parity)."""

    logits: np.ndarray
    predictions: np.ndarray
    top5: List[List[Tuple[int, float]]]
    latency_s: float

    @property
    def images_per_s(self) -> float:
        n = self.logits.shape[0]
        return n / self.latency_s if self.latency_s else 0.0


@dataclasses.dataclass
class StreamResult:
    """stream() output: whole-stream logits/labels + throughput.
    ``labels`` is None when the loader was built without labels."""

    logits: np.ndarray
    predictions: np.ndarray
    labels: Optional[np.ndarray]
    latency_s: float
    images_per_s: float

    @property
    def accuracy(self) -> float:
        if self.labels is None:
            raise ValueError(
                "stream ran without labels; accuracy is undefined")
        return float((self.predictions == self.labels).mean())


class InferenceEngine:
    """Load a quantized model once, run batched INT8 inference many times.

    ``model`` is any object exposing as_device_params(); ``make_forward``
    is its forward builder (models.mnist_cnn.make_forward or
    models.resnet18.make_forward).
    """

    def __init__(
        self,
        model,
        make_forward: Callable,
        backend: Optional[str] = None,
        use_pallas: bool = True,
        timeout_s: float = 300.0,
        bake_weights: Optional[bool] = None,
    ):
        self.backend = backend_mod.resolve_backend(backend)
        self.timeout_s = timeout_s
        self.model = model
        use_pallas = use_pallas and self.backend != "golden"
        # Weight upload happens once here — the TPU-native analog of the
        # reference's load_sparse_weights DMA (accel.py:177-236).
        self._device = backend_mod.default_device(self.backend)
        with jax.default_device(self._device):
            self.params = jax.device_put(model.as_device_params(),
                                         self._device)
        fwd = make_forward(model, use_pallas=use_pallas,
                           backend=self.backend)
        # Weight-stationary compilation: on TPU the weights are static
        # serving state, so bake them into the program as constants — XLA
        # then pre-folds each conv's weight relayout at compile time
        # (measured +13% end-to-end vs passing weights as runtime args).
        # The hardware analog is literal: weights live IN the array
        # (load_weight), activations stream past them.
        if bake_weights is None:
            bake_weights = self.backend == "tpu"
        if bake_weights:
            params = self.params

            def _baked_fwd(p, x, _baked=jax.jit(lambda x: fwd(params, x))):
                # Baked weights are immutable serving state: a swapped
                # params dict would be silently ignored, so fail loudly
                # instead (rebuild the engine to hot-swap weights).
                if p is not params:
                    raise AcceleratorError(
                        AccelErrorCode.INVALID_CONFIG,
                        "engine was built with bake_weights=True; weights "
                        "are compiled-in constants and cannot be swapped — "
                        "construct a new InferenceEngine (or pass "
                        "bake_weights=False) to serve updated params")
                return _baked(x)

            self._fwd = _baked_fwd
        else:
            self._fwd = jax.jit(fwd)
        self.profiler = LayerProfiler()

    # ------------------------------------------------------------------ api
    def run_inference(self, x: np.ndarray, k: int = 5) -> InferenceResult:
        """Forward a batch; mirrors run_layer's start/wait_done/timeout."""
        if x.ndim != 4:
            raise AcceleratorError(
                AccelErrorCode.INVALID_CONFIG,
                f"expected NCHW input, got shape {x.shape}")
        t0 = time.perf_counter()
        with jax.default_device(self._device):
            out = self._fwd(self.params,
                            jax.device_put(jnp.asarray(x, jnp.float32),
                                           self._device))
        try:
            out = jax.block_until_ready(out)
        except Exception as e:  # device-side failure surfaces here
            raise AcceleratorError(AccelErrorCode.BACKEND_UNAVAILABLE,
                                   str(e))
        dt = time.perf_counter() - t0
        if dt > self.timeout_s:
            raise AcceleratorError(
                AccelErrorCode.TIMEOUT,
                f"inference took {dt:.1f}s > timeout {self.timeout_s}s")
        logits = np.asarray(out)
        return InferenceResult(
            logits=logits,
            predictions=logits.argmax(axis=-1),
            top5=top_k(logits, k=min(k, logits.shape[-1])),
            latency_s=dt)

    def benchmark(self, x: np.ndarray, iters: int = 10) -> PerfMetrics:
        """Steady-state throughput (ResNetInference::benchmark parity)."""
        with jax.default_device(self._device):
            xj = jax.device_put(jnp.asarray(x, jnp.float32), self._device)
            out = self._fwd(self.params, xj)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                out = np.asarray(self._fwd(self.params, xj))
                best = min(best, time.perf_counter() - t0)
        m = PerfMetrics(name="forward", latency_s=best,
                        total_ops=0, bytes_accessed=0)
        self.profiler.add(m)
        return m

    def stream(self, loader, n_batches: int) -> "StreamResult":
        """Streaming inference off a native BatchLoader: dispatch every
        batch asynchronously (JAX queues device work) so the C++ worker
        threads prepare batch j+1 while the device runs batch j — the
        act_dma / ping-pong overlap of the reference, host-side.

        The loader must be configured with quant_scale = the model's
        input activation scale; its int8 batches skip the on-device
        quantize step (make_forward accepts int8 input directly).

        The first dispatch compiles the int8-input graph and runs
        OUTSIDE the throughput clock; images_per_s covers the remaining
        batches (the first batch is re-timed when n_batches == 1).
        """
        if n_batches < 1:
            raise AcceleratorError(AccelErrorCode.INVALID_CONFIG,
                                   f"n_batches={n_batches} < 1")
        outs, labels = [], []
        has_labels = getattr(loader, "has_labels", True)

        def wait(x):
            # Only genuine device failures surface here; loader/host
            # errors propagate with their own types.
            try:
                jax.block_until_ready(x)
            except Exception as e:
                raise AcceleratorError(
                    AccelErrorCode.BACKEND_UNAVAILABLE, str(e))

        with jax.default_device(self._device):
            x0, y0 = loader.next()
            x0 = jnp.asarray(x0)
            first = self._fwd(self.params, x0)
            wait(first)  # compile, unclocked
            outs.append(first)
            labels.append(y0)
            t0 = time.perf_counter()
            if n_batches == 1:
                wait(self._fwd(self.params, x0))
                timed_images = x0.shape[0]
            else:
                for _ in range(n_batches - 1):
                    x, y = loader.next()
                    outs.append(self._fwd(self.params, jnp.asarray(x)))
                    labels.append(y)
                wait(outs)
                timed_images = sum(o.shape[0] for o in outs[1:])
            dt = time.perf_counter() - t0
        logits = np.concatenate([np.asarray(o) for o in outs])
        return StreamResult(
            logits=logits,
            predictions=logits.argmax(axis=-1),
            labels=np.concatenate(labels) if has_labels else None,
            latency_s=dt,
            images_per_s=timed_images / dt)

    def verify_accuracy(
        self, x: np.ndarray, labels: Sequence[int]
    ) -> float:
        """Top-1 accuracy over a labeled set (verify_accuracy parity)."""
        res = self.run_inference(x)
        return float((res.predictions == np.asarray(labels)).mean())

    def profile(self, x: np.ndarray, iters: int = 5) -> str:
        """Per-layer performance table: measured end-to-end latency
        distributed over the static per-layer roofline model
        (runtime.profile) — the per-layer PerfCounters readout."""
        from resnet_accel_tpu.runtime.profile import (
            profile_resnet18, profile_table)
        m = self.benchmark(x, iters=iters)
        prof = profile_resnet18(
            self.model, input_hw=x.shape[-1], batch=x.shape[0],
            measured_latency_s=m.latency_s)
        self.profiler = prof
        return profile_table(prof)

    def get_model_sparsity(self) -> Dict[str, float]:
        """Per-layer block sparsity if the model carries BSR weights."""
        # Models expose .sparsity_report() when sparse; dense models: {}.
        if hasattr(self.model, "sparsity_report"):
            return self.model.sparsity_report()
        return {}
