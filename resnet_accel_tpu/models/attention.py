"""Sparse INT8 attention projections — the transformer fixtures, computed.

The reference ships block-sparse transformer Q/K/V projection weights as
fixtures (sw/exporters/export_transformer.py: d_model=128, d_head=64,
80/90% sparsity, 8x8 blocks) but never runs them — there is no
attention compute anywhere in its tree (SURVEY §5 long-context: absent).
This module closes that gap TPU-natively: the Q/K/V projections run as
INT8 block-sparse GEMMs through the zero-skip machinery, and a
single-head scaled-dot-product attention consumes the dequantized
projections in fp32.

Contract: projections are int8 x int8 -> int32, dequantized per output
channel (scale_x * scales_w[c]); the attention math (softmax) is fp32 —
same placement of the int8/fp32 boundary as the CNN models' logits.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops.bsr_matmul import (
    GatherBSR,
    bsr_matmul_wt_xla,
    pack_gather_bsr,
)
from resnet_accel_tpu.sparse import (
    BSRMatrix,
    load_layer_dir,
    load_layer_scales_bias,
)


@dataclasses.dataclass
class SparseProjection:
    """One INT8 block-sparse projection W[d_out, d_in]."""

    bsr: BSRMatrix
    gather: GatherBSR
    scales: np.ndarray          # [d_out] per-channel weight scales
    bias: Optional[np.ndarray]  # [d_out] fp32

    @classmethod
    def from_fixture_dir(cls, path: str) -> "SparseProjection":
        bsr = load_layer_dir(path)
        scales, bias = load_layer_scales_bias(path)
        if scales is None:
            raise ValueError(f"{path}: missing scales.npy")
        return cls(bsr=bsr, gather=pack_gather_bsr(bsr), scales=scales,
                   bias=bias)

    @property
    def d_out(self) -> int:
        return self.bsr.shape[0]

    @property
    def d_in(self) -> int:
        return self.bsr.shape[1]

    def project(self, x_int8: jnp.ndarray, x_scale: float) -> jnp.ndarray:
        """[T, d_in] int8 -> [T, d_out] fp32 via the zero-skip GEMM."""
        acc = bsr_matmul_wt_xla(x_int8, self.gather)      # int32
        out = acc.astype(jnp.float32) * (
            jnp.float32(x_scale) * jnp.asarray(self.scales))
        if self.bias is not None:
            out = out + jnp.asarray(self.bias)
        return out

    def project_golden(self, x_int8: np.ndarray,
                       x_scale: float) -> np.ndarray:
        acc = golden.bsr_matmul_int8_wt(
            x_int8, self.bsr.data, self.bsr.row_ptr, self.bsr.col_idx,
            self.bsr.block_h, self.bsr.block_w, N=self.d_out)
        out = acc.astype(np.float32) * (
            np.float32(x_scale) * self.scales[None, :])
        if self.bias is not None:
            out = out + self.bias[None, :]
        return out


@dataclasses.dataclass
class SparseAttentionInt8:
    """Single-head attention with INT8 block-sparse Q/K/V projections."""

    q: SparseProjection
    k: SparseProjection
    v: SparseProjection

    @classmethod
    def from_fixture_root(cls, root: str) -> "SparseAttentionInt8":
        """Load a fixture directory tree holding q/ k/ v/ subdirs
        (sparse.fixtures layout) — or the reference's flat 80pct/90pct
        dirs when per-matrix subdirs exist."""
        subs = {}
        for name in ("q", "k", "v"):
            p = os.path.join(root, name)
            if not os.path.isdir(p):
                raise FileNotFoundError(f"missing projection dir {p}")
            subs[name] = SparseProjection.from_fixture_dir(p)
        return cls(q=subs["q"], k=subs["k"], v=subs["v"])

    def sparsity_report(self) -> Dict[str, float]:
        return {name: proj.bsr.sparsity_pct / 100.0
                for name, proj in
                (("q", self.q), ("k", self.k), ("v", self.v))}

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[T, d_model] fp32 -> [T, d_head] attention output.

        Input quantized symmetric per-tensor; projections int8-sparse;
        softmax(QK^T/sqrt(d)) V in fp32.
        """
        x = jnp.asarray(x, jnp.float32)
        x_scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
        xq = jnp.clip(jnp.rint(x / x_scale), -128, 127).astype(jnp.int8)
        q = self.q.project(xq, x_scale)
        k = self.k.project(xq, x_scale)
        v = self.v.project(xq, x_scale)
        d = q.shape[-1]
        # fp32 attention math must not fall back to TPU's default bf16
        # matmul passes — pin to highest precision for golden parity.
        logits = jnp.matmul(
            q, k.T, precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
            jnp.float32(d))
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.matmul(attn, v, precision=jax.lax.Precision.HIGHEST)

    def forward_golden(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        x_scale = max(float(np.abs(x).max()) / 127.0, 1e-12)
        xq = np.clip(np.rint(x / x_scale), -128, 127).astype(np.int8)
        q = self.q.project_golden(xq, x_scale)
        k = self.k.project_golden(xq, x_scale)
        v = self.v.project_golden(xq, x_scale)
        d = q.shape[-1]
        logits = (q @ k.T) / np.sqrt(np.float32(d))
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        attn = e / e.sum(axis=-1, keepdims=True)
        return attn @ v
