"""resnet_accel_tpu — a TPU-native INT8 block-sparse CNN inference framework.

A from-scratch rebuild of the capabilities of ACCEL-v1
(joshuathomascarter/ResNet-Accel, an FPGA INT8 block-sparse CNN accelerator)
as an idiomatic JAX / XLA / Pallas stack:

- ``golden``   — pure-numpy bit-exact reference models (the numerical spec,
                 semantics-parity with hw/sim/cpp/src/golden_models.cpp).
- ``quant``    — INT8 post-training quantization + activation calibration
                 (parity with sw/INT8 quantization/).
- ``sparse``   — BSR block-sparse packing + artifact I/O, format-compatible
                 with the reference's data/ exports (sw/training/export_bsr*).
- ``ops``      — the TPU compute path: Pallas MXU kernels (dense + BSR int8
                 matmul with fused requant/ReLU epilogues) and XLA ops.
- ``models``   — MNIST CNN and ResNet-18 INT8 inference graphs.
- ``runtime``  — inference engine, backend seam, perf metrics.
- ``parallel`` — device-mesh sharding for batched serving (dp/tp over ICI).
- ``train``    — JAX training: dense, progressive block-sparse pruning.
- ``utils``    — tiling math, shared helpers.
"""

__version__ = "0.1.0"
