"""Tensor (head) parallelism — the transformer block sharded over heads.

Beyond-parity scaling: the INT8 sparse encoder block runs with attention
heads sharded over the ``tp`` mesh axis (the Megatron split, adapted to
BSR weights and INT8 semantics):

- ``wq/wk/wv`` and ``w1`` are ROW-sharded: each rank holds the gather-BSR
  block-rows of its heads (resp. its d_ff slice) — a pure slice of the
  packed arrays, no repacking — and computes only its slice of Q/K/V,
  attention (the O(T^2) part scales with 1/tp), and the MLP hidden.
- ``wo`` and ``w2`` stay replicated: each rank zero-fills the positions
  of the other ranks' heads (resp. hidden units), projects, and the
  int32 accumulators ``psum`` over ``tp`` BEFORE dequantization, so the
  float math after the reduction is identical to one device.  (A column
  shard would also scale these two GEMMs; the zero-fill form was chosen
  because it keeps bit-exactness trivial — int32 addition commutes.)
- Dynamic INT8 quantization of sharded activations uses a GLOBAL absmax
  (``lax.pmax`` over ``tp``) so every rank quantizes exactly like the
  unsharded computation (the same discipline as parallel.sequence).

Result: every integer decision (quantization, int32 accumulation) is
exact vs the single-device block; the remaining difference is fp32
reassociation in LN/softmax/attention across differently-compiled
programs (the environment's FMA/excess-precision behavior), bounded at
~1e-5 by the tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from resnet_accel_tpu.models.attention import SparseProjection
from resnet_accel_tpu.models.transformer import (
    LN_EPS,
    TransformerBlockInt8,
)
from resnet_accel_tpu.ops.bsr_matmul import GatherBSR, bsr_matmul_wt_xla


def _stack_row_shards(p: SparseProjection, tp: int):
    """Split a projection's gather-BSR arrays into ``tp`` row shards
    (stacked on a new leading axis) plus per-shard scales/bias."""
    g = p.gather
    nbr = g.blocks.shape[0]
    if nbr % tp or p.d_out % tp:
        raise ValueError(
            f"d_out={p.d_out} (block rows {nbr}) not divisible by tp={tp}")
    per = nbr // tp
    blocks = np.asarray(g.blocks).reshape(tp, per, *g.blocks.shape[1:])
    gidx = np.asarray(g.gather_idx).reshape(tp, per, g.lmax)
    scales = np.asarray(p.scales).reshape(tp, -1)
    bias = (np.asarray(p.bias).reshape(tp, -1)
            if p.bias is not None else np.zeros_like(scales))
    return (jnp.asarray(blocks), jnp.asarray(gidx), jnp.asarray(scales),
            jnp.asarray(bias))


def _local_gather(g: GatherBSR, blocks, gidx, tp: int) -> GatherBSR:
    """A rank-local GatherBSR view over row-sharded arrays."""
    return dataclasses.replace(
        g, blocks=blocks, gather_idx=gidx,
        n_out=g.n_out // tp, n_padded=g.n_padded // tp)


def make_tp_transformer_forward(
    mesh: Mesh,
    block: TransformerBlockInt8,
) -> Callable:
    """Jit a head-parallel forward of the encoder block.

    Returns fwd(x [T, d_model]) -> [T, d_model]; x and the output are
    replicated, weights are sharded over the 'tp' axis.  Requires
    n_heads, d_model block-rows and d_ff block-rows all divisible by
    the 'tp' axis size.
    """
    if "tp" not in mesh.axis_names:
        raise ValueError("mesh must have a 'tp' axis")
    tp = mesh.shape["tp"]
    H = block.n_heads
    D = block.d_model
    if H % tp:
        raise ValueError(f"n_heads={H} not divisible by tp={tp}")

    qkv_shards = {name: _stack_row_shards(getattr(block, name), tp)
                  for name in ("wq", "wk", "wv")}
    w1_shards = _stack_row_shards(block.w1, tp)
    d_ff = block.w1.d_out

    def q_dyn_local(v):
        """Replicated input -> every rank computes the same scale."""
        scale = jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-12)
        return jnp.clip(jnp.rint(v / scale), -128,
                        127).astype(jnp.int8), scale

    def q_dyn_global(v):
        """Zero-filled sharded input -> global absmax over tp."""
        scale = jnp.maximum(
            jax.lax.pmax(jnp.max(jnp.abs(v)), "tp") / 127.0, 1e-12)
        return jnp.clip(jnp.rint(v / scale), -128,
                        127).astype(jnp.int8), scale

    def ln(v, gamma, beta):
        mu = v.mean(axis=-1, keepdims=True)
        var = v.var(axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * jnp.asarray(gamma) + jnp.asarray(beta)

    def row_proj(proj_src, shards, q, s):
        """Rank-local slice of a row-sharded projection: int32 acc ->
        fp32 with the shard's scales/bias."""
        blocks, gidx, scales, bias = shards
        g = _local_gather(proj_src.gather, blocks, gidx, tp)
        acc = bsr_matmul_wt_xla(q, g)
        return acc.astype(jnp.float32) * (s * scales) + bias

    def full_proj_psum(proj_src, q, s):
        """Replicated-weight projection of a zero-filled shard: psum
        the int32 accumulators, then dequantize once."""
        acc = bsr_matmul_wt_xla(q, proj_src.gather)
        acc = jax.lax.psum(acc, "tp")
        out = acc.astype(jnp.float32) * (s * jnp.asarray(proj_src.scales))
        if proj_src.bias is not None:
            out = out + jnp.asarray(proj_src.bias)
        return out

    def tp_program(x, wq_s, wk_s, wv_s, w1_s):
        # shard_map passes the rank-local slice WITH the leading shard
        # axis of size 1 — drop it.
        wq_s, wk_s, wv_s, w1_s = (
            tuple(a[0] for a in s) for s in (wq_s, wk_s, wv_s, w1_s))
        T = x.shape[0]
        h_loc = H // tp
        dh = D // H
        rank = jax.lax.axis_index("tp")

        h = ln(x, block.ln1_g, block.ln1_b)
        q8, s = q_dyn_local(h)
        qh = row_proj(block.wq, wq_s, q8, s).reshape(T, h_loc, dh)
        kh = row_proj(block.wk, wk_s, q8, s).reshape(T, h_loc, dh)
        vh = row_proj(block.wv, wv_s, q8, s).reshape(T, h_loc, dh)
        qh, kh, vh = (a.transpose(1, 0, 2) for a in (qh, kh, vh))
        logits = jnp.einsum(
            "htd,hsd->hts", qh, kh,
            precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
            jnp.float32(dh))
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("hts,hsd->htd", attn, vh,
                         precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.transpose(1, 0, 2).reshape(T, h_loc * dh)
        # Zero-fill the other ranks' head positions, project with the
        # full wo, psum int32.
        ctx_full = jnp.zeros((T, D), ctx.dtype)
        ctx_full = jax.lax.dynamic_update_slice(
            ctx_full, ctx, (0, rank * h_loc * dh))
        q8, s = q_dyn_global(ctx_full)
        x = x + full_proj_psum(block.wo, q8, s)

        h = ln(x, block.ln2_g, block.ln2_b)
        q8, s = q_dyn_local(h)
        hid = jax.nn.gelu(row_proj(block.w1, w1_s, q8, s))
        hid_full = jnp.zeros((T, d_ff), hid.dtype)
        hid_full = jax.lax.dynamic_update_slice(
            hid_full, hid, (0, rank * (d_ff // tp)))
        q8, s = q_dyn_global(hid_full)
        return x + full_proj_psum(block.w2, q8, s)

    shard_specs = (P("tp"), P("tp"), P("tp"), P("tp"))
    fwd = shard_map(
        tp_program, mesh=mesh,
        in_specs=(P(),) + shard_specs,
        out_specs=P(),
        check_vma=False,
    )

    def apply(x):
        return fwd(x, qkv_shards["wq"], qkv_shards["wk"],
                   qkv_shards["wv"], w1_shards)

    return jax.jit(apply)


def _tp_block_cached_step(block: TransformerBlockInt8, scales,
                          max_len: int, tp: int):
    """Rank-local cached decode step for ONE block, to be called
    INSIDE a shard_map over the 'tp' axis (shards WITHOUT the leading
    stack axis).  ``x_t`` [1, d_model] replicated; ``k/v_cache``
    rank-local head slices [max_len, d_model/tp]; static activation
    scales.  Returns (y [1, d_model] replicated, k_cache, v_cache).
    Shared by make_tp_decode_step (single block) and
    make_tp_lm_generate (the full LM) so the two layouts cannot
    drift."""
    H, D = block.n_heads, block.d_model
    h_loc, dh = H // tp, D // H
    d_ff = block.w1.d_out

    def ln(v, gamma, beta):
        mu = v.mean(axis=-1, keepdims=True)
        var = v.var(axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * jnp.asarray(gamma) + jnp.asarray(beta)

    def q_static(v, s):
        return jnp.clip(jnp.rint(v / jnp.float32(s)), -128,
                        127).astype(jnp.int8)

    def row_proj(proj_src, shards, q, s):
        blocks, gidx, sc, bias = shards
        g = _local_gather(proj_src.gather, blocks, gidx, tp)
        acc = bsr_matmul_wt_xla(q, g)
        return acc.astype(jnp.float32) * (jnp.float32(s) * sc) + bias

    def full_proj_psum(proj_src, q, s):
        acc = bsr_matmul_wt_xla(q, proj_src.gather)
        acc = jax.lax.psum(acc, "tp")
        out = acc.astype(jnp.float32) * (
            jnp.float32(s) * jnp.asarray(proj_src.scales))
        if proj_src.bias is not None:
            out = out + jnp.asarray(proj_src.bias)
        return out

    def step(x_t, k_cache, v_cache, length, wq_s, wk_s, wv_s, w1_s):
        rank = jax.lax.axis_index("tp")

        h = ln(x_t, block.ln1_g, block.ln1_b)
        q8 = q_static(h, scales["h1"])
        s = scales["h1"]
        q_l = row_proj(block.wq, wq_s, q8, s)      # [1, h_loc*dh]
        k_l = row_proj(block.wk, wk_s, q8, s)
        v_l = row_proj(block.wv, wv_s, q8, s)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_l, (length, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_l, (length, 0))

        qh = q_l.reshape(1, h_loc, dh).transpose(1, 0, 2)
        kh = k_cache.reshape(max_len, h_loc, dh).transpose(1, 0, 2)
        vh = v_cache.reshape(max_len, h_loc, dh).transpose(1, 0, 2)
        logits = jnp.einsum(
            "htd,hsd->hts", qh, kh,
            precision=jax.lax.Precision.HIGHEST)[:, 0, :] / jnp.sqrt(
            jnp.float32(dh))                       # [h_loc, max_len]
        mask = jnp.arange(max_len) <= length
        logits = jnp.where(mask[None, :], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("hs,hsd->hd", attn, vh,
                         precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.reshape(1, h_loc * dh)
        ctx_full = jnp.zeros((1, D), ctx.dtype)
        ctx_full = jax.lax.dynamic_update_slice(
            ctx_full, ctx, (0, rank * h_loc * dh))
        x_t = x_t + full_proj_psum(
            block.wo, q_static(ctx_full, scales["ctx"]), scales["ctx"])

        h = ln(x_t, block.ln2_g, block.ln2_b)
        hid = jax.nn.gelu(row_proj(
            block.w1, w1_s, q_static(h, scales["h2"]), scales["h2"]))
        hid_full = jnp.zeros((1, d_ff), hid.dtype)
        hid_full = jax.lax.dynamic_update_slice(
            hid_full, hid, (0, rank * (d_ff // tp)))
        y = x_t + full_proj_psum(
            block.w2, q_static(hid_full, scales["mlp"]), scales["mlp"])
        return y, k_cache, v_cache

    return step


def make_tp_decode_step(
    mesh: Mesh,
    block: TransformerBlockInt8,
    scales,
    max_len: int,
):
    """Head-parallel CACHED DECODE — the multi-chip serving layout.

    Each rank holds only its heads' K/V cache slice
    ``[max_len, d_model/tp]`` (so KV memory scales 1/tp, the reason
    tensor-parallel serving exists), computes its heads' attention
    locally, and the single cross-chip reduction is the int32 ``psum``
    inside the output projection — same discipline as
    make_tp_transformer_forward but with STATIC activation scales (the
    serving path's calibrated scales: every rank quantizes
    identically, no global absmax collective needed).

    Returns ``(init_caches, step)`` where ``step(caches, x_t)`` ->
    ``(y_t [1, d_model], caches)`` mirrors
    ``TransformerBlockInt8.decode_step``; integer decisions are exact
    vs the single-device step, the residual is fp32 reassociation
    across differently-compiled programs (same bound as the tp
    forward, tested).
    """
    if "tp" not in mesh.axis_names:
        raise ValueError("mesh must have a 'tp' axis")
    tp = mesh.shape["tp"]
    H, D = block.n_heads, block.d_model
    if H % tp:
        raise ValueError(f"n_heads={H} not divisible by tp={tp}")

    qkv_shards = {name: _stack_row_shards(getattr(block, name), tp)
                  for name in ("wq", "wk", "wv")}
    w1_shards = _stack_row_shards(block.w1, tp)
    blk_step = _tp_block_cached_step(block, scales, max_len, tp)

    def tp_step(x_t, k_cache, v_cache, length,
                wq_s, wk_s, wv_s, w1_s):
        # shard_map hands rank-local slices with the shard axis kept
        wq_s, wk_s, wv_s, w1_s = (
            tuple(a[0] for a in s) for s in (wq_s, wk_s, wv_s, w1_s))
        y, k_cache, v_cache = blk_step(
            x_t, k_cache, v_cache, length, wq_s, wk_s, wv_s, w1_s)
        return y, k_cache, v_cache, length + 1

    cache_spec = P(None, "tp")   # [max_len, D] feature-sharded
    shard_specs = (P("tp"), P("tp"), P("tp"), P("tp"))
    stepped = shard_map(
        tp_step, mesh=mesh,
        in_specs=(P(), cache_spec, cache_spec, P()) + shard_specs,
        out_specs=(P(), cache_spec, cache_spec, P()),
        check_vma=False,
    )

    def init_caches():
        zeros = jnp.zeros((max_len, D), jnp.float32)
        sharding = NamedSharding(mesh, cache_spec)
        return {"k": jax.device_put(zeros, sharding),
                "v": jax.device_put(zeros, sharding),
                "len": jnp.int32(0)}

    @jax.jit
    def step(cache, x_t):
        y, k, v, n = stepped(
            x_t, cache["k"], cache["v"], cache["len"],
            qkv_shards["wq"], qkv_shards["wk"], qkv_shards["wv"],
            w1_shards)
        return y, {"k": k, "v": v, "len": n}

    return init_caches, step


def make_tp_lm_generate(
    mesh: Mesh,
    model,
    scales,
    n_new: int,
    max_len: int = None,
    batched: bool = False,
):
    """Head-parallel cached GREEDY GENERATE of the FULL LM — the
    multi-chip serving layout end to end (embedding -> every block with
    per-rank KV slices -> final LN -> tied readout), not just one block
    (make_tp_decode_step).

    Each rank holds every block's row shards of wq/wk/wv/w1 and a
    ``[max_len, d_model/tp]`` K/V slice per block (KV memory scales
    1/tp); the only cross-chip traffic is the int32 ``psum`` inside
    each block's wo/w2 projections — integer decisions are exact vs
    the single-device ``TransformerLMInt8.generate``, so greedy tokens
    are identical up to fp32 reassociation at argmax ties (tested
    token-exact on the virtual mesh).  Prefill is a scan of cached
    decode steps (numerically identical to the parallel prefill under
    static scales — models/lm.py documents the equivalence).

    ``batched=True``: the serving composition — ``prompt`` is [B, T]
    with B sharded over the mesh's 'dp' axis and each dp group running
    the tp-sharded generate on its local sequences (vmapped rank-local
    program; the tp psum composes under vmap).  Returns [B, n_new].

    Reference note: the reference is single-accelerator (SURVEY.md
    §2.4); this is the beyond-parity multi-chip serving path the
    README's architecture table claims.
    """
    if "tp" not in mesh.axis_names:
        raise ValueError("mesh must have a 'tp' axis")
    if batched and "dp" not in mesh.axis_names:
        raise ValueError("batched=True needs a 'dp' axis")
    tp = mesh.shape["tp"]
    blocks = model.blocks
    D = model.d_model
    ML = model.max_len if max_len is None else max_len
    if ML > model.max_len:
        raise ValueError(f"max_len {ML} exceeds the position table "
                         f"({model.max_len})")
    for blk in blocks:
        if blk.n_heads % tp:
            raise ValueError(
                f"n_heads={blk.n_heads} not divisible by tp={tp}")

    steps = [_tp_block_cached_step(blk, scales[i], ML, tp)
             for i, blk in enumerate(blocks)]
    # 16 shard arrays per block (4 projections x 4 arrays), flattened
    # for shard_map specs
    flat_shards = []
    for blk in blocks:
        for name in ("wq", "wk", "wv", "w1"):
            flat_shards.extend(_stack_row_shards(getattr(blk, name), tp))
    embed = jnp.asarray(model.embed)
    pos_table = jnp.asarray(model.pos)
    lnf_g, lnf_b = jnp.asarray(model.lnf_g), jnp.asarray(model.lnf_b)

    def one_sequence(prompt, shards):
        """Rank-local greedy generate of one sequence (prompt [T])."""

        def decode(carry, tok):
            ks, vs, pos = carry
            x = embed[tok][None, :] + pos_table[pos][None, :]
            new_ks, new_vs = [], []
            for i, st in enumerate(steps):
                x, k, v = st(x, ks[i], vs[i], pos, *shards[i])
                new_ks.append(k)
                new_vs.append(v)
            mu = x.mean(axis=-1, keepdims=True)
            var = x.var(axis=-1, keepdims=True)
            h = (x - mu) * jax.lax.rsqrt(var + LN_EPS) * lnf_g + lnf_b
            logits = jnp.einsum(
                "td,vd->tv", h, embed,
                precision=jax.lax.Precision.HIGHEST)[0]
            nxt = jnp.argmax(logits).astype(jnp.int32)
            return (new_ks, new_vs, pos + 1), nxt

        k0 = [jnp.zeros((ML, D // tp), jnp.float32) for _ in blocks]
        v0 = [jnp.zeros((ML, D // tp), jnp.float32) for _ in blocks]
        carry, outs = jax.lax.scan(decode, (k0, v0, jnp.int32(0)),
                                   prompt)                  # prefill
        tok = outs[-1]

        def gen(ct, _):
            carry, tok = ct
            carry, nxt = decode(carry, tok)
            return (carry, nxt), tok

        (_, _), toks = jax.lax.scan(gen, (carry, tok), None,
                                    length=n_new)
        return toks

    def lm_program(prompt, *flat):
        # regroup + drop the leading shard-stack axis once
        shards = []
        for b in range(len(blocks)):
            blk_flat = flat[16 * b:16 * (b + 1)]
            shards.append(tuple(
                tuple(a[0] for a in blk_flat[4 * j:4 * (j + 1)])
                for j in range(4)))
        if batched:
            return jax.vmap(lambda p: one_sequence(p, shards))(prompt)
        return one_sequence(prompt, shards)

    prompt_spec = P("dp") if batched else P()
    fwd = shard_map(
        lm_program, mesh=mesh,
        in_specs=(prompt_spec,) + (P("tp"),) * len(flat_shards),
        out_specs=prompt_spec,
        check_vma=False,
    )
    return jax.jit(lambda prompt: fwd(jnp.asarray(prompt, jnp.int32),
                                      *flat_shards))
