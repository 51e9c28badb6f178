"""INT8 block-sparse decoder language model — beyond-parity coverage.

Stacks N :class:`TransformerBlockInt8` blocks (all projections INT8 BSR,
zero-skip GEMM) under a token embedding with sinusoidal positions and a
tied readout head:

    tokens -> embed + pos -> [block x N, causal] -> LN_f -> x @ embed.T

The reference ships only transformer *fixtures* (Q/K/V weights,
``sw/exporters/export_transformer.py:63-112``) with no attention
computation; this module extends that capability to a complete
autoregressive LM with two inference paths that are numerically
identical given the same calibrated static activation scales:

* ``forward(tokens, scales)`` — full-sequence causal teacher-forced pass
  (training/prefill shape: one big GEMM per projection, MXU-friendly).
* ``decode_step`` / ``generate`` — incremental decoding through per-block
  KV caches, with generation as a single jitted ``lax.scan`` (static
  shapes, no per-token dispatch from Python).

Static per-tap scales come from :meth:`calibrate` (absmax/127 observed on
a calibration sequence, per block), mirroring the activation-calibration
flow of the reference PTQ (``quantize_resnet18.py:103-160``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu.models.transformer import LN_EPS, TransformerBlockInt8

Scales = List[Dict[str, float]]


def sampled_token(logits, key, temperature: float,
                  top_k: "Optional[int]" = None):
    """One stochastic draw shared by ``TransformerLMInt8.sample`` and the
    continuous batcher (runtime/serving.py): split the key, apply
    temperature and optional top-k truncation, draw categorically.
    Returns (next_key, token int32).  Keeping this in ONE place is what
    makes the batcher's streams provably identical to sample()'s.
    """
    k2, sub = jax.random.split(key)
    z = logits / jnp.float32(temperature)
    if top_k is not None and top_k < z.shape[-1]:
        kth = jax.lax.top_k(z, top_k)[0][-1]
        z = jnp.where(z < kth, -jnp.inf, z)
    return k2, jax.random.categorical(sub, z).astype(jnp.int32)


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Standard fixed sinusoidal position table [max_len, d_model]."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    dim = np.arange(0, d_model, 2, dtype=np.float32)[None, :]
    ang = pos / np.power(10000.0, dim / np.float32(d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


@dataclasses.dataclass
class TransformerLMInt8:
    """Decoder-only LM over INT8 block-sparse transformer blocks."""

    embed: np.ndarray                  # [vocab, d_model] fp32
    pos: np.ndarray                    # [max_len, d_model] fp32
    blocks: List[TransformerBlockInt8]
    lnf_g: np.ndarray
    lnf_b: np.ndarray

    # ------------------------------------------------------------- build
    @classmethod
    def from_random(
        cls,
        vocab: int = 64,
        d_model: int = 128,
        n_heads: int = 4,
        d_ff: int = 256,
        n_layers: int = 2,
        max_len: int = 64,
        sparsity: float = 0.8,
        block: int = 8,
        seed: int = 0,
    ) -> "TransformerLMInt8":
        rng = np.random.default_rng(seed)
        emb = rng.normal(0, 0.5, (vocab, d_model)).astype(np.float32)
        blocks = [
            TransformerBlockInt8.from_random(
                d_model=d_model, n_heads=n_heads, d_ff=d_ff,
                sparsity=sparsity, block=block, seed=seed + 100 * (i + 1))
            for i in range(n_layers)
        ]
        return cls(embed=emb, pos=sinusoidal_positions(max_len, d_model),
                   blocks=blocks, lnf_g=np.ones(d_model, np.float32),
                   lnf_b=np.zeros(d_model, np.float32))

    @property
    def d_model(self) -> int:
        return self.embed.shape[1]

    @property
    def vocab(self) -> int:
        return self.embed.shape[0]

    @property
    def max_len(self) -> int:
        return self.pos.shape[0]

    # --------------------------------------------------------- calibrate
    def calibrate(self, tokens: np.ndarray) -> Scales:
        """Per-block static activation scales from one calibration
        sequence (golden numpy propagation, causal)."""
        x = self.embed[np.asarray(tokens)] + self.pos[: len(tokens)]
        scales: Scales = []
        for blk in self.blocks:
            scales.append(blk.calibrate_scales(x))
            x = blk.forward_golden(x, causal=True)
        return scales

    # ----------------------------------------------------------- helpers
    def _ln_f(self, x: jnp.ndarray) -> jnp.ndarray:
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * jnp.asarray(self.lnf_g) + jnp.asarray(self.lnf_b)

    def _logits(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("td,vd->tv", self._ln_f(x),
                          jnp.asarray(self.embed),
                          precision=jax.lax.Precision.HIGHEST)

    # ------------------------------------------------------ full forward
    def forward(self, tokens: jnp.ndarray,
                scales: Optional[Scales] = None,
                flash: bool = False) -> jnp.ndarray:
        """Teacher-forced causal pass: int tokens [T] -> logits [T, V].

        ``flash=True`` routes attention through the online-softmax
        Pallas kernel (prefill at serving length without the [T, T]
        score tensor)."""
        T = tokens.shape[0]
        x = jnp.asarray(self.embed)[tokens] + jnp.asarray(self.pos)[:T]
        for i, blk in enumerate(self.blocks):
            x = blk(x, causal=True,
                    scales=None if scales is None else scales[i],
                    flash=flash)
        return self._logits(x)

    def forward_golden(self, tokens: np.ndarray) -> np.ndarray:
        """Numpy reference (dynamic activation scales)."""
        x = self.embed[np.asarray(tokens)] + self.pos[: len(tokens)]
        for blk in self.blocks:
            x = blk.forward_golden(x, causal=True)
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        x = (x - mu) / np.sqrt(var + LN_EPS) * self.lnf_g + self.lnf_b
        return x @ self.embed.T

    # ----------------------------------------------------------- decode
    def init_caches(self, max_len: Optional[int] = None):
        n = self.max_len if max_len is None else max_len
        return [blk.init_cache(n) for blk in self.blocks]

    def decode_step(self, caches, tok: jnp.ndarray, scales: Scales
                    ) -> Tuple[jnp.ndarray, list]:
        """One token through all blocks. ``tok``: scalar int32.
        Returns (logits [V], updated caches)."""
        pos = caches[0]["len"]
        x = jnp.asarray(self.embed)[tok][None, :] \
            + jax.lax.dynamic_slice_in_dim(jnp.asarray(self.pos), pos, 1)
        new_caches = []
        for i, blk in enumerate(self.blocks):
            x, c = blk.decode_step(caches[i], x, scales[i])
            new_caches.append(c)
        return self._logits(x)[0], new_caches

    def generate(self, prompt: jnp.ndarray, n_new: int, scales: Scales,
                 jit: bool = True, parallel_prefill: bool = True,
                 flash: bool = False, batched: bool = False
                 ) -> jnp.ndarray:
        """Greedy decode as one jitted program (static shapes).

        Prefill fills the per-block KV caches from the prompt; by
        default it runs as ONE full causal forward per block
        (``TransformerBlockInt8.prefill`` — batched GEMMs, optionally
        the flash-attention kernel via ``flash=True``), numerically
        equal to the token-by-token path (``parallel_prefill=False``,
        a ``lax.scan`` of decode steps).  Decoding then scans
        ``n_new`` argmax steps through the caches.

        ``batched=True``: ``prompt`` is [B, T] and decoding runs over
        the batch via ``vmap`` (independent caches per sequence);
        returns [B, n_new].
        """

        n_prompt = int(np.asarray(prompt).shape[-1])
        if n_prompt + n_new > self.max_len:
            raise ValueError(
                f"prompt ({n_prompt}) + n_new ({n_new}) exceeds "
                f"max_len ({self.max_len}); cache/position writes "
                f"would silently clamp")

        def run(prompt_toks):
            T = prompt_toks.shape[0]

            if parallel_prefill:
                x = jnp.asarray(self.embed)[prompt_toks] \
                    + jnp.asarray(self.pos)[:T]
                caches = []
                for i, blk in enumerate(self.blocks):
                    x, c = blk.prefill(x, scales[i],
                                       blk.init_cache(self.max_len),
                                       flash=flash)
                    caches.append(c)
                last = self._logits(x[-1:])[0]  # readout: last row only
            else:
                caches = self.init_caches()

                def prefill(carry, tok):
                    caches = carry
                    logits, caches = self.decode_step(caches, tok,
                                                      scales)
                    return caches, logits

                caches, logits = jax.lax.scan(prefill, caches,
                                              prompt_toks)
                last = logits[-1]
            tok = jnp.argmax(last).astype(jnp.int32)

            def step(carry, _):
                caches, tok = carry
                logits, caches = self.decode_step(caches, tok, scales)
                nxt = jnp.argmax(logits).astype(jnp.int32)
                return (caches, nxt), tok

            (_, _), toks = jax.lax.scan(step, (caches, tok), None,
                                        length=n_new)
            return toks

        if batched:
            run = jax.vmap(run)
        if not jit:
            return run(jnp.asarray(prompt, jnp.int32))
        # Cache the jitted program per configuration — a fresh
        # jax.jit(closure) every call would recompile every call
        # (measured ~15 s/generate on the tunneled chip).
        if not hasattr(self, "_gen_cache"):
            self._gen_cache = {}
        key = (n_new, parallel_prefill, flash, batched,
               tuple(tuple(sorted(d.items())) for d in scales))
        if key not in self._gen_cache:
            self._gen_cache[key] = jax.jit(run)
        return self._gen_cache[key](jnp.asarray(prompt, jnp.int32))

    def sample(self, prompt: jnp.ndarray, n_new: int, scales: Scales,
               rng_key, temperature: float = 1.0,
               top_k: Optional[int] = None, jit: bool = True,
               flash: bool = False) -> jnp.ndarray:
        """Stochastic decoding: temperature + optional top-k truncation.

        One jitted program (parallel prefill + ``lax.scan`` of sampled
        steps).  ``temperature <= 0`` degenerates to greedy argmax
        (identical to ``generate``); ``top_k`` keeps only the k largest
        logits before the categorical draw.  Deterministic for a fixed
        ``rng_key`` (jax.random.PRNGKey/key).
        """
        n_prompt = int(np.asarray(prompt).shape[-1])
        if n_prompt + n_new > self.max_len:
            raise ValueError(
                f"prompt ({n_prompt}) + n_new ({n_new}) exceeds "
                f"max_len ({self.max_len})")
        if top_k is not None and top_k < 1:
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        greedy = temperature <= 0.0

        def run(prompt_toks, key):
            T = prompt_toks.shape[0]
            x = jnp.asarray(self.embed)[prompt_toks] \
                + jnp.asarray(self.pos)[:T]
            caches = []
            for i, blk in enumerate(self.blocks):
                x, c = blk.prefill(x, scales[i],
                                   blk.init_cache(self.max_len),
                                   flash=flash)
                caches.append(c)
            first = self._logits(x[-1:])[0]
            if greedy:
                tok = jnp.argmax(first).astype(jnp.int32)
            else:
                key, tok = sampled_token(first, key, temperature, top_k)

            def step(carry, _):
                caches, tok, key = carry
                logits, caches = self.decode_step(caches, tok, scales)
                if greedy:
                    nxt = jnp.argmax(logits).astype(jnp.int32)
                else:
                    key, nxt = sampled_token(logits, key, temperature,
                                             top_k)
                return (caches, nxt, key), tok

            (_, _, _), toks = jax.lax.scan(
                step, (caches, tok, key), None, length=n_new)
            return toks

        if not jit:
            return run(jnp.asarray(prompt, jnp.int32), rng_key)
        if not hasattr(self, "_sample_cache"):
            self._sample_cache = {}
        ck = (n_new, float(temperature), top_k, flash, n_prompt,
              tuple(tuple(sorted(d.items())) for d in scales))
        if ck not in self._sample_cache:
            self._sample_cache[ck] = jax.jit(run)
        return self._sample_cache[ck](jnp.asarray(prompt, jnp.int32),
                                      rng_key)
