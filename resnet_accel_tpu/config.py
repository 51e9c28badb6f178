"""Typed configuration — the single source of truth for framework constants.

The reference duplicates its machine configuration byte-exactly across
SystemVerilog, C++ and Python (csr.sv / csr_map.hpp / csr_map.py, see
reference sw/host_axi/csr_map.py:15-119).  This module keeps the same
single-source-of-truth discipline in one typed place: every layer shape,
scale, sparsity flag and block-size parameter used by kernels, the runtime
and the exporters comes from here.

Reference parity:
- ``LayerConfig`` mirrors AcceleratorDriver's LayerConfig
  (hw/sim/cpp/include/accelerator_driver.hpp:106-189): M/N/K dims, tile
  geometry, scales, BSR geometry, is_sparse/relu flags and tile-count
  helpers.
- ``REF_BLOCK`` = 14 is the reference's hardware-locked systolic block
  (hw/rtl/top/accel_top.sv BLOCK_SIZE=14).  On TPU the block size is a
  *parameter*: the MXU is 128x128, so performance-mode BSR uses
  ``MXU_BLOCK`` = 128 blocks while 14x14 remains supported for bit-exact
  replay of the reference's exported fixtures.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# --------------------------------------------------------------------------
# Hardware constants
# --------------------------------------------------------------------------

#: The reference accelerator's block size (14x14 systolic array on Zynq-7020).
REF_BLOCK: int = 14
#: Bytes per reference block (14*14 INT8).
REF_BLOCK_ELEMENTS: int = REF_BLOCK * REF_BLOCK

#: TPU MXU native tile (128x128).  Default BSR block size in performance mode.
MXU_BLOCK: int = 128
#: TPU min int8 tile (sublane x lane) — int8 arrays tile as (32, 128).
INT8_SUBLANE: int = 32
LANE: int = 128

#: INT8 quantization range.
INT8_MIN: int = -128
INT8_MAX: int = 127

#: Numerical floor for quantization scales (reference quantize.py:66).
SCALE_EPS: float = 1e-12


def cdiv(a: int, b: int) -> int:
    """Ceiling division (reference sw/utils/tile_counts.py:31)."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m``."""
    return cdiv(x, m) * m


# --------------------------------------------------------------------------
# Layer configuration
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LayerConfig:
    """Configuration for one GEMM-shaped layer execution.

    TPU-native equivalent of the reference's LayerConfig
    (accelerator_driver.hpp:106-189) and the CSR DIMS/TILES/SCALE registers.
    ``M`` is rows of the activation matrix (batch x spatial), ``K`` the
    reduction dim, ``N`` output features.
    """

    name: str
    M: int
    K: int
    N: int
    # Quantization scales: out = requant(acc, act_scale * wgt_scale, out_scale)
    act_scale: float = 1.0
    out_scale: float = 1.0
    # Per-output-channel weight scales are carried by the weight artifact;
    # wgt_scale is the per-tensor fallback.
    wgt_scale: float = 1.0
    # Fused epilogue flags (output_accumulator.sv fused ReLU->requant path).
    relu: bool = False
    has_bias: bool = False
    # Sparsity
    is_sparse: bool = False
    block_h: int = MXU_BLOCK
    block_w: int = MXU_BLOCK
    # Tiling (Pallas grid tile sizes; the reference used Tm=Tn=Tk=14).
    tile_m: int = 128
    tile_n: int = 128
    tile_k: int = 512

    # -- tile-count helpers (parity with LayerConfig::num_*_tiles) ---------
    @property
    def m_tiles(self) -> int:
        return cdiv(self.M, self.tile_m)

    @property
    def n_tiles(self) -> int:
        return cdiv(self.N, self.tile_n)

    @property
    def k_tiles(self) -> int:
        return cdiv(self.K, self.tile_k)

    @property
    def total_macs(self) -> int:
        return self.M * self.K * self.N

    @property
    def total_ops(self) -> int:
        """2 ops (multiply + add) per MAC — GOPS accounting used throughout
        the reference (performance_config.hpp:15-20)."""
        return 2 * self.total_macs

    def validate(self) -> None:
        """Input validation (parity with validate_config,
        accelerator_driver.hpp:631)."""
        if min(self.M, self.K, self.N) <= 0:
            raise ValueError(f"{self.name}: dims must be positive, got "
                             f"M={self.M} K={self.K} N={self.N}")
        if self.act_scale <= 0 or self.out_scale <= 0:
            raise ValueError(f"{self.name}: scales must be positive")
        if self.block_h <= 0 or self.block_w <= 0:
            raise ValueError(f"{self.name}: block size must be positive")


@dataclasses.dataclass(frozen=True)
class ConvConfig:
    """Configuration for an int8 conv layer lowered to im2col->GEMM.

    Mirrors the conv parameters of golden conv2d_int8_*
    (golden_models.cpp:684,883): CHW input, OIHW weights, zero padding.
    """

    name: str
    in_channels: int
    out_channels: int
    kernel: int
    stride: int = 1
    padding: int = 0
    relu: bool = False
    has_bias: bool = True
    is_sparse: bool = False

    def out_hw(self, H: int, W: int) -> Tuple[int, int]:
        H_out = (H + 2 * self.padding - self.kernel) // self.stride + 1
        W_out = (W + 2 * self.padding - self.kernel) // self.stride + 1
        return H_out, W_out

    @property
    def patch_size(self) -> int:
        """Flattened patch length = rows of the im2col matrix."""
        return self.in_channels * self.kernel * self.kernel


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Post-training quantization configuration (sw/INT8 quantization)."""

    #: 'per_channel' (axis 0 = output channels) or 'per_tensor'.
    weight_mode: str = "per_channel"
    #: Activations are symmetric per-tensor in the reference flow
    #: (quantize.py:257).
    act_mode: str = "per_tensor"
    #: Number of calibration samples (quantize_resnet18.py calibrate).
    calib_samples: int = 32


@dataclasses.dataclass(frozen=True)
class BSRConfig:
    """BSR packing configuration (sw/training/export_bsr_14x14.py)."""

    block_h: int = REF_BLOCK
    block_w: int = REF_BLOCK
    #: L2-norm threshold below which a block is dropped as zero
    #: (export_bsr_14x14.py:171).
    threshold: float = 1e-10
