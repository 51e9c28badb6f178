"""INT8 block-sparse Mixture-of-Experts MLP — the expert-parallel model.

Beyond-parity coverage: a top-1 routed MoE feed-forward block whose
expert MLPs are per-channel INT8 BSR weights through the zero-skip
gather GEMM (the same projection machinery as the transformer block).
The router is a small fp32 linear.  ``parallel.experts`` shards the
experts over the ``ep`` mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu.models.attention import SparseProjection
from resnet_accel_tpu.models.transformer import _make_projection
from resnet_accel_tpu.sparse.fixtures import create_sparse_mask


@dataclasses.dataclass
class Expert:
    w1: SparseProjection     # d_model -> d_ff
    w2: SparseProjection     # d_ff -> d_model


@dataclasses.dataclass
class MoEBlockInt8:
    experts: List[Expert]
    router_w: np.ndarray     # [E, d_model] fp32

    @classmethod
    def from_random(
        cls,
        n_experts: int = 4,
        d_model: int = 128,
        d_ff: int = 256,
        sparsity: float = 0.8,
        block: int = 8,
        seed: int = 0,
    ) -> "MoEBlockInt8":
        rng = np.random.default_rng(seed)

        def w(o, i, s):
            base = rng.normal(0, 1.0 / np.sqrt(i), (o, i)).astype(np.float32)
            return base * create_sparse_mask((o, i), block, sparsity,
                                             seed=s)

        experts = []
        for e in range(n_experts):
            experts.append(Expert(
                w1=_make_projection(
                    w(d_ff, d_model, seed + 10 + e), block,
                    rng.normal(0, 0.01, d_ff).astype(np.float32)),
                w2=_make_projection(
                    w(d_model, d_ff, seed + 50 + e), block,
                    rng.normal(0, 0.01, d_model).astype(np.float32)),
            ))
        router = rng.normal(0, 0.1, (n_experts, d_model)).astype(np.float32)
        return cls(experts=experts, router_w=router)

    @property
    def n_experts(self) -> int:
        return len(self.experts)

    def sparsity_report(self) -> Dict[str, float]:
        return {f"expert{e}": ex.w1.bsr.sparsity_pct / 100.0
                for e, ex in enumerate(self.experts)}

    # ------------------------------------------------------------- route
    def route(self, x) -> jnp.ndarray:
        """Top-1 expert index per token (argmax of router logits)."""
        logits = x @ jnp.asarray(self.router_w).T
        return jnp.argmax(logits, axis=-1)

    @staticmethod
    def _q_dyn(x):
        scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
        q = jnp.clip(jnp.rint(x / scale), -128, 127).astype(jnp.int8)
        return q, scale

    def _expert_fwd(self, e: int, x) -> jnp.ndarray:
        ex = self.experts[e]
        q, s = self._q_dyn(x)
        h = jax.nn.gelu(ex.w1.project(q, s))
        q2, s2 = self._q_dyn(h)
        return ex.w2.project(q2, s2)

    # --------------------------------------------------------------- jax
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[T, d_model] -> [T, d_model]: each token through its expert.

        Dense-compute formulation (every expert on every token, masked
        select) — exact and simple; the ep-sharded version in
        parallel.experts distributes the expert loop over chips.
        """
        sel = self.route(x)
        outs = jnp.stack([self._expert_fwd(e, x)
                          for e in range(self.n_experts)])   # [E, T, D]
        onehot = jax.nn.one_hot(sel, self.n_experts,
                                dtype=x.dtype)               # [T, E]
        return jnp.einsum("etd,te->td", outs, onehot)

    # ------------------------------------------------------------ golden
    def forward_golden(self, x: np.ndarray) -> np.ndarray:
        """Mirrors the dense-compute-and-mask formulation exactly (the
        dynamic quantization scales are computed over the full token set
        per expert, matching the jax path)."""
        logits = x @ self.router_w.T
        sel = np.argmax(logits, axis=-1)
        out = np.zeros_like(x, dtype=np.float32)
        scale = max(float(np.abs(x).max()) / 127.0, 1e-12)
        q = np.clip(np.rint(x / scale), -128, 127).astype(np.int8)
        for e, ex in enumerate(self.experts):
            z = ex.w1.project_golden(q, scale)
            gelu = 0.5 * z * (1.0 + np.tanh(
                np.sqrt(2.0 / np.pi) * (z + 0.044715 * z ** 3)))
            s2 = max(float(np.abs(gelu).max()) / 127.0, 1e-12)
            q2 = np.clip(np.rint(gelu / s2), -128, 127).astype(np.int8)
            y = ex.w2.project_golden(q2, s2)
            mask = sel == e
            out[mask] = y[mask]
        return out
