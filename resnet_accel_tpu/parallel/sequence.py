"""Sequence parallelism — the transformer block sharded over tokens.

Beyond-parity scaling (the reference has no sequence dimension at all;
SURVEY §5 long-context: absent): the INT8 sparse transformer encoder
block runs with the sequence dim sharded over the ``sp`` mesh axis.

Layout per rank (classic sequence parallelism):
- LayerNorm, projections, MLP: token-local — run on the shard directly.
- Attention: Q stays sharded; K and V are all-gathered over ``sp`` so
  each rank attends its query shard against the full sequence.
- Dynamic INT8 quantization: the per-tensor scale must be GLOBAL or the
  shards would quantize differently than a single device — the absmax
  reduces with ``lax.pmax`` over ``sp`` before quantizing, making the
  sharded computation match the unsharded one.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from resnet_accel_tpu.models.transformer import LN_EPS, TransformerBlockInt8


def make_sp_transformer_forward(
    mesh: Mesh,
    block: TransformerBlockInt8,
) -> Callable:
    """Jit a sequence-parallel forward of the encoder block.

    Returns fwd(x [T, d_model]) -> [T, d_model] with T divisible by the
    'sp' axis size; the input/output are sharded over tokens.
    """
    if "sp" not in mesh.axis_names:
        raise ValueError("mesh must have an 'sp' axis")

    H = block.n_heads

    def q_dyn_global(v):
        """Distributed dynamic int8 quantization: global absmax scale."""
        local = jnp.max(jnp.abs(v))
        scale = jnp.maximum(jax.lax.pmax(local, "sp") / 127.0, 1e-12)
        q = jnp.clip(jnp.rint(v / scale), -128, 127).astype(jnp.int8)
        return q, scale

    def proj(p, v):
        q, s = q_dyn_global(v)
        return p.project(q, s)

    def ln(v, gamma, beta):
        mu = v.mean(axis=-1, keepdims=True)
        var = v.var(axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * jnp.asarray(gamma) + jnp.asarray(beta)

    def sp_program(x):                      # x: [T/sp, D] token shard
        Tl, D = x.shape
        dh = D // H

        h = ln(x, block.ln1_g, block.ln1_b)
        qh = proj(block.wq, h).reshape(Tl, H, dh).transpose(1, 0, 2)
        kh = proj(block.wk, h).reshape(Tl, H, dh).transpose(1, 0, 2)
        vh = proj(block.wv, h).reshape(Tl, H, dh).transpose(1, 0, 2)

        # Gather the full-sequence K/V over ICI; Q stays sharded.
        k_full = jax.lax.all_gather(kh, "sp", axis=1, tiled=True)
        v_full = jax.lax.all_gather(vh, "sp", axis=1, tiled=True)

        logits = jnp.einsum(
            "htd,hsd->hts", qh, k_full,
            precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
            jnp.float32(dh))
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("hts,hsd->htd", attn, v_full,
                         precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.transpose(1, 0, 2).reshape(Tl, D)
        x = x + proj(block.wo, ctx)

        h = ln(x, block.ln2_g, block.ln2_b)
        m = jax.nn.gelu(proj(block.w1, h))
        return x + proj(block.w2, m)

    fwd = shard_map(
        sp_program, mesh=mesh,
        in_specs=P("sp", None),
        out_specs=P("sp", None),
        check_vma=False)
    return jax.jit(fwd)
