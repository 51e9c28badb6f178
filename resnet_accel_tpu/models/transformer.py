"""INT8 block-sparse transformer encoder block — beyond-parity coverage.

Extends the attention-projection capability (models.attention, built on
the reference's transformer fixtures) to a complete encoder block:

    x -> LN -> MultiHead(Q,K,V,O int8-sparse projections) -> +x
      -> LN -> MLP(W1 -> GELU -> W2, int8-sparse) -> +residual

All eight weight matrices are per-channel INT8 in BSR form and run
through the zero-skip gather GEMM; activations quantize dynamically
per-tensor at each projection input (the int8/fp32 boundary sits at the
projections, exactly like the CNN models put it at conv/fc layers);
LayerNorm, softmax, GELU and residuals are fp32.

Golden (numpy) and jax paths share the arithmetic; tests check them
against each other and the block-sparsity accounting.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu.models.attention import SparseProjection
from resnet_accel_tpu.ops.bsr_matmul import pack_gather_bsr
from resnet_accel_tpu.quant import quantize_symmetric_per_channel
from resnet_accel_tpu.sparse import build_bsr
from resnet_accel_tpu.sparse.fixtures import create_sparse_mask

LN_EPS = 1e-5


def _make_projection(w_fp32: np.ndarray, block: int,
                     bias: Optional[np.ndarray]) -> SparseProjection:
    _, scales = quantize_symmetric_per_channel(w_fp32, axis=0)
    bsr = build_bsr(w_fp32, block, threshold=1e-10, quantize=True,
                    scales=scales)
    return SparseProjection(bsr=bsr, gather=pack_gather_bsr(bsr),
                            scales=scales, bias=bias)


@dataclasses.dataclass
class TransformerBlockInt8:
    """One encoder block with INT8 block-sparse projections."""

    wq: SparseProjection
    wk: SparseProjection
    wv: SparseProjection
    wo: SparseProjection
    w1: SparseProjection      # d_model -> d_ff
    w2: SparseProjection      # d_ff -> d_model
    ln1_g: np.ndarray
    ln1_b: np.ndarray
    ln2_g: np.ndarray
    ln2_b: np.ndarray
    n_heads: int

    # ------------------------------------------------------------- build
    @classmethod
    def from_random(
        cls,
        d_model: int = 128,
        n_heads: int = 4,
        d_ff: int = 256,
        sparsity: float = 0.8,
        block: int = 8,
        seed: int = 0,
    ) -> "TransformerBlockInt8":
        """Deterministic block-sparse random block (fixture-style masks)."""
        rng = np.random.default_rng(seed)

        def w(o, i, s):
            base = rng.normal(0, 1.0 / np.sqrt(i), (o, i)).astype(np.float32)
            return base * create_sparse_mask((o, i), block, sparsity,
                                             seed=s)

        def b(o):
            return rng.normal(0, 0.01, o).astype(np.float32)

        return cls(
            wq=_make_projection(w(d_model, d_model, seed + 1), block,
                                b(d_model)),
            wk=_make_projection(w(d_model, d_model, seed + 2), block,
                                b(d_model)),
            wv=_make_projection(w(d_model, d_model, seed + 3), block,
                                b(d_model)),
            wo=_make_projection(w(d_model, d_model, seed + 4), block,
                                b(d_model)),
            w1=_make_projection(w(d_ff, d_model, seed + 5), block,
                                b(d_ff)),
            w2=_make_projection(w(d_model, d_ff, seed + 6), block,
                                b(d_model)),
            ln1_g=np.ones(d_model, np.float32),
            ln1_b=np.zeros(d_model, np.float32),
            ln2_g=np.ones(d_model, np.float32),
            ln2_b=np.zeros(d_model, np.float32),
            n_heads=n_heads,
        )

    @property
    def d_model(self) -> int:
        return self.wq.d_in

    def sparsity_report(self) -> Dict[str, float]:
        return {name: p.bsr.sparsity_pct / 100.0 for name, p in [
            ("wq", self.wq), ("wk", self.wk), ("wv", self.wv),
            ("wo", self.wo), ("w1", self.w1), ("w2", self.w2)]}

    # ----------------------------------------------------------- helpers
    @staticmethod
    def _q_dyn(x):
        """Dynamic symmetric per-tensor int8 quantization (jnp)."""
        scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
        q = jnp.clip(jnp.rint(x / scale), -128, 127).astype(jnp.int8)
        return q, scale

    @staticmethod
    def _q_dyn_np(x):
        scale = max(float(np.abs(x).max()) / 127.0, 1e-12)
        q = np.clip(np.rint(x / scale), -128, 127).astype(np.int8)
        return q, scale

    def calibrate_scales(self, x: np.ndarray) -> Dict[str, float]:
        """Static activation scales for serving (absmax/127 at each
        projection input, observed on a calibration sequence)."""
        obs = {}

        def ln_np(v, gamma, beta):
            mu = v.mean(axis=-1, keepdims=True)
            var = v.var(axis=-1, keepdims=True)
            return (v - mu) / np.sqrt(var + LN_EPS) * gamma + beta

        h = ln_np(x, self.ln1_g, self.ln1_b)
        obs["h1"] = float(np.abs(h).max())
        y = self.forward_golden(x)  # drive through to observe ctx/h2
        # Re-derive intermediate taps.
        T, D = x.shape
        Hh = self.n_heads
        dh = D // Hh
        q1, s1 = self._q_dyn_np(h)
        qh = self.wq.project_golden(q1, s1).reshape(T, Hh, dh)
        kh = self.wk.project_golden(q1, s1).reshape(T, Hh, dh)
        vh = self.wv.project_golden(q1, s1).reshape(T, Hh, dh)
        qe = qh.transpose(1, 0, 2)
        ke = kh.transpose(1, 0, 2)
        ve = vh.transpose(1, 0, 2)
        logits = np.einsum("htd,hsd->hts", qe, ke) / np.sqrt(np.float32(dh))
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        attn = e / e.sum(axis=-1, keepdims=True)
        ctx = np.einsum("hts,hsd->htd", attn, ve).transpose(1, 0, 2)
        ctx = ctx.reshape(T, D)
        obs["ctx"] = float(np.abs(ctx).max())
        x2 = x + self.wo.project_golden(*self._q_dyn_np(ctx))
        h2 = ln_np(x2, self.ln2_g, self.ln2_b)
        obs["h2"] = float(np.abs(h2).max())
        z = self.w1.project_golden(*self._q_dyn_np(h2))
        gelu = 0.5 * z * (1.0 + np.tanh(
            np.sqrt(2.0 / np.pi) * (z + 0.044715 * z ** 3)))
        obs["mlp"] = float(np.abs(gelu).max())
        return {k: max(v / 127.0, 1e-12) for k, v in obs.items()}

    # ------------------------------------------------- KV-cache decoding
    def init_cache(self, max_len: int):
        """Empty KV cache: dict(k, v [max_len, d_model], len)."""
        D = self.d_model
        return {
            "k": jnp.zeros((max_len, D), jnp.float32),
            "v": jnp.zeros((max_len, D), jnp.float32),
            "len": jnp.int32(0),
        }

    # Shared decode pieces: decode_step (contiguous cache) and the
    # paged engine (runtime.paged, block-table K/V) call the SAME
    # projection/attention code so the two paths cannot drift.

    def _ln(self, v, gamma, beta):
        mu = v.mean(axis=-1, keepdims=True)
        var = v.var(axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * jnp.asarray(gamma) + jnp.asarray(beta)

    def _proj(self, p, v, s):
        q = jnp.clip(jnp.rint(v / jnp.float32(s)), -128,
                     127).astype(jnp.int8)
        return p.project(q, jnp.float32(s))

    def qkv_project(self, x_t: jnp.ndarray, scales: Dict[str, float]):
        """LN1 + Q/K/V projections, row-wise: [S, d_model] -> three
        [S, d_model] (S=1 for single-token decode)."""
        h = self._ln(x_t, self.ln1_g, self.ln1_b)
        return (self._proj(self.wq, h, scales["h1"]),
                self._proj(self.wk, h, scales["h1"]),
                self._proj(self.wv, h, scales["h1"]))

    def attend_mlp(self, x_t: jnp.ndarray, q_t: jnp.ndarray,
                   k_all: jnp.ndarray, v_all: jnp.ndarray, pos,
                   scales: Dict[str, float]) -> jnp.ndarray:
        """Causal attention over a K/V view (positions > ``pos``
        masked) + output projection + MLP.  ``k_all``/``v_all``:
        [L, d_model] — a contiguous cache or a gathered page view;
        position ``pos`` must already hold this token's K/V."""
        D, H = self.d_model, self.n_heads
        dh = D // H
        qh = q_t.reshape(1, H, dh).transpose(1, 0, 2)       # [H,1,dh]
        kh = k_all.reshape(-1, H, dh).transpose(1, 0, 2)    # [H,L,dh]
        vh = v_all.reshape(-1, H, dh).transpose(1, 0, 2)
        logits = jnp.einsum(
            "htd,hsd->hts", qh, kh,
            precision=jax.lax.Precision.HIGHEST)[:, 0, :] / jnp.sqrt(
            jnp.float32(dh))                                 # [H, L]
        L = k_all.shape[0]
        mask = jnp.arange(L) <= pos
        logits = jnp.where(mask[None, :], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("hs,hsd->hd", attn, vh,
                         precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.reshape(1, D)
        x_t = x_t + self._proj(self.wo, ctx, scales["ctx"])

        h = self._ln(x_t, self.ln2_g, self.ln2_b)
        m = jax.nn.gelu(self._proj(self.w1, h, scales["h2"]))
        return x_t + self._proj(self.w2, m, scales["mlp"])

    def decode_step(self, cache, x_t: jnp.ndarray,
                    scales: Dict[str, float]):
        """One-token causal decode with the KV cache.

        ``x_t``: [1, d_model]; ``scales``: static activation scales from
        calibrate_scales (static scales make cached decoding numerically
        identical to the full causal forward run with the same scales).
        Returns (y_t [1, d_model], updated cache).
        """
        q_t, k_t, v_t = self.qkv_project(x_t, scales)

        pos = cache["len"]
        k_all = jax.lax.dynamic_update_slice(cache["k"], k_t, (pos, 0))
        v_all = jax.lax.dynamic_update_slice(cache["v"], v_t, (pos, 0))
        cache = {"k": k_all, "v": v_all, "len": pos + 1}

        y = self.attend_mlp(x_t, q_t, k_all, v_all, pos, scales)
        return y, cache

    def attend_mlp_multi(self, x_s: jnp.ndarray, q_s: jnp.ndarray,
                         k_all: jnp.ndarray, v_all: jnp.ndarray, pos,
                         scales: Dict[str, float]) -> jnp.ndarray:
        """S-row causal attention over a K/V view (row i masks
        positions > ``pos + i``) + output projection + MLP — the
        verify-pass attention on an externally materialized view (a
        contiguous cache via ``verify_step``, or the paged engine's
        gathered page view).  ``k_all``/``v_all``: [L, d_model];
        positions pos..pos+S-1 must already hold the S rows' K/V."""
        S = x_s.shape[0]
        D, H = self.d_model, self.n_heads
        dh = D // H
        L = k_all.shape[0]
        qh = q_s.reshape(S, H, dh).transpose(1, 0, 2)     # [H,S,dh]
        kh = k_all.reshape(L, H, dh).transpose(1, 0, 2)   # [H,L,dh]
        vh = v_all.reshape(L, H, dh).transpose(1, 0, 2)
        logits = jnp.einsum(
            "htd,hsd->hts", qh, kh,
            precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
            jnp.float32(dh))                              # [H,S,L]
        mask = (jnp.arange(L)[None, :]
                <= pos + jnp.arange(S)[:, None])          # [S, L]
        logits = jnp.where(mask[None, :, :], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("hts,hsd->htd", attn, vh,
                         precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.transpose(1, 0, 2).reshape(S, D)
        x_s = x_s + self._proj(self.wo, ctx, scales["ctx"])
        h = self._ln(x_s, self.ln2_g, self.ln2_b)
        m = jax.nn.gelu(self._proj(self.w1, h, scales["h2"]))
        return x_s + self._proj(self.w2, m, scales["mlp"])

    def verify_step(self, cache, x_s: jnp.ndarray,
                    scales: Dict[str, float]):
        """Multi-token causal decode: S tokens [S, d_model] at
        positions len..len+S-1, attending the cache AND each other
        (causally).  The speculative-decoding verify pass — one
        batched GEMM per projection where S ``decode_step`` calls
        would issue S tiny ones, numerically identical per row (same
        static scales, same HIGHEST-precision einsum contraction
        order per query).  Returns (y [S, d_model], cache with
        len += S); callers that reject draft tokens roll ``len`` back
        — stale K/V above ``len`` is masked by position and
        overwritten by the next write at ``len``."""
        q, k, v = self.qkv_project(x_s, scales)           # [S, D] each
        pos = cache["len"]
        k_all = jax.lax.dynamic_update_slice(cache["k"], k, (pos, 0))
        v_all = jax.lax.dynamic_update_slice(cache["v"], v, (pos, 0))
        y = self.attend_mlp_multi(x_s, q, k_all, v_all, pos, scales)
        return y, {"k": k_all, "v": v_all, "len": pos + x_s.shape[0]}

    # --------------------------------------------------------------- jax
    def __call__(self, x: jnp.ndarray, causal: bool = False,
                 scales: Optional[Dict[str, float]] = None,
                 flash: bool = False) -> jnp.ndarray:
        """[T, d_model] fp32 -> [T, d_model] fp32.

        ``flash=True`` routes attention through the online-softmax
        Pallas kernel (ops.flash_attention) — no [T, T] score tensor in
        HBM; differs from the einsum path only by float reassociation.
        """
        return self._forward_kv(x, causal, scales, flash)[0]

    def prefill(self, x: jnp.ndarray, scales: Dict[str, float], cache,
                flash: bool = False):
        """Parallel KV-cache fill: one full causal forward over the
        prompt [T, d_model] that also writes each position's K/V into
        ``cache`` — numerically equal to T ``decode_step`` calls with
        the same static scales, but one batched GEMM per projection
        (and optionally the flash kernel) instead of T tiny ones.
        Returns (y [T, d_model], cache with len = T)."""
        T = x.shape[0]
        y, k_flat, v_flat = self._forward_kv(x, True, scales, flash)
        k_all = jax.lax.dynamic_update_slice(cache["k"], k_flat, (0, 0))
        v_all = jax.lax.dynamic_update_slice(cache["v"], v_flat, (0, 0))
        return y, {"k": k_all, "v": v_all, "len": jnp.int32(T)}

    def _forward_kv(self, x: jnp.ndarray, causal: bool,
                    scales: Optional[Dict[str, float]],
                    flash: bool):
        """Shared body: returns (y, k_flat [T, D], v_flat [T, D])."""
        T, D = x.shape
        H = self.n_heads
        dh = D // H

        def ln(v, gamma, beta):
            mu = v.mean(axis=-1, keepdims=True)
            var = v.var(axis=-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + LN_EPS) \
                * jnp.asarray(gamma) + jnp.asarray(beta)

        def proj(p: SparseProjection, v, tap=None):
            if scales is not None and tap is not None:
                sc = jnp.float32(scales[tap])
                q = jnp.clip(jnp.rint(v / sc), -128, 127).astype(jnp.int8)
                return p.project(q, sc)
            q, s = self._q_dyn(v)
            return p.project(q, s)

        h = ln(x, self.ln1_g, self.ln1_b)
        qh = proj(self.wq, h, "h1").reshape(T, H, dh).transpose(1, 0, 2)
        k_flat = proj(self.wk, h, "h1")                   # [T, D]
        v_flat = proj(self.wv, h, "h1")
        kh = k_flat.reshape(T, H, dh).transpose(1, 0, 2)
        vh = v_flat.reshape(T, H, dh).transpose(1, 0, 2)
        if flash:
            from resnet_accel_tpu.ops.flash_attention import \
                flash_attention
            ctx = flash_attention(qh, kh, vh, causal=causal)
        else:
            logits = jnp.einsum(
                "htd,hsd->hts", qh, kh,
                precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
                jnp.float32(dh))
            if causal:
                mask = jnp.tril(jnp.ones((T, T), bool))
                logits = jnp.where(mask[None], logits, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1)
            ctx = jnp.einsum("hts,hsd->htd", attn, vh,
                             precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.transpose(1, 0, 2).reshape(T, D)
        x = x + proj(self.wo, ctx, "ctx")

        h = ln(x, self.ln2_g, self.ln2_b)
        m = jax.nn.gelu(proj(self.w1, h, "h2"))
        return x + proj(self.w2, m, "mlp"), k_flat, v_flat

    # ------------------------------------------------------------ golden
    def forward_golden(self, x: np.ndarray, causal: bool = False
                       ) -> np.ndarray:
        T, D = x.shape
        H = self.n_heads
        dh = D // H

        def ln(v, gamma, beta):
            mu = v.mean(axis=-1, keepdims=True)
            var = v.var(axis=-1, keepdims=True)
            return (v - mu) / np.sqrt(var + LN_EPS) * gamma + beta

        def proj(p: SparseProjection, v):
            q, s = self._q_dyn_np(v)
            return p.project_golden(q, s)

        h = ln(x, self.ln1_g, self.ln1_b)
        qh = proj(self.wq, h).reshape(T, H, dh).transpose(1, 0, 2)
        kh = proj(self.wk, h).reshape(T, H, dh).transpose(1, 0, 2)
        vh = proj(self.wv, h).reshape(T, H, dh).transpose(1, 0, 2)
        logits = np.einsum("htd,hsd->hts", qh, kh) / np.sqrt(
            np.float32(dh))
        if causal:
            mask = np.tril(np.ones((T, T), bool))
            logits = np.where(mask[None], logits, -np.inf)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        attn = e / e.sum(axis=-1, keepdims=True)
        ctx = np.einsum("hts,hsd->htd", attn, vh)
        ctx = ctx.transpose(1, 0, 2).reshape(T, D)
        x = x + proj(self.wo, ctx)

        h = ln(x, self.ln2_g, self.ln2_b)
        z = proj(self.w1, h)
        gelu = 0.5 * z * (1.0 + np.tanh(
            np.sqrt(2.0 / np.pi) * (z + 0.044715 * z ** 3)))
        return x + proj(self.w2, gelu)
