"""Tensor-parallel device programs for the paged-KV serving engine.

The PRODUCTION engine sharded, not a parallel twin: ``PagedKVBatcher``
(runtime.paged) keeps its host scheduler — admission, block tables,
page free-list, preemption, prefix cache — unchanged, and swaps only
the three jitted device programs (chunk decode, teacher-forced scoring,
speculative verify) for shard_map programs over a mesh 'tp' axis built
here.  Layout (the Megatron split proven in parallel.heads, applied to
page pools):

- **KV page pools sliced by head**: the global pools keep their
  ``[n_layers, n_pages, page, d_model]`` shape but are sharded on the
  feature axis (``PartitionSpec(None, None, None, 'tp')``) — each rank
  holds only its heads' slice of every page, so paged-KV pool memory
  scales 1/tp exactly like the contiguous tp cache
  (parallel.heads.make_tp_decode_step).
- ``wq/wk/wv/w1`` row-sharded per rank (a pure slice of the packed
  gather-BSR arrays); each rank computes its heads' Q/K/V, scatters
  its K/V slice into its pool shard, gathers its page view, and runs
  its heads' attention locally.
- ``wo/w2`` replicated; each rank zero-fills the other ranks' head
  (resp. hidden) positions and the int32 accumulators ``psum`` over
  'tp' BEFORE dequantization — ONE collective per projection, and
  integer decisions identical to the single-device engine (static
  activation scales mean every rank quantizes the replicated
  activations identically; int32 addition commutes).
- Block tables, lengths, PRNG keys, logits and sampling are replicated
  (every rank runs the same scalar program on psum'd activations), so
  the host scheduler cannot tell a tp engine from a single-device one.
- ``kv_dtype='int8'`` composes: the per-token quantization scale is the
  GLOBAL row absmax (``lax.pmax`` over 'tp'), so each rank's int8 page
  slice is bit-identical to the corresponding slice of the
  single-device int8 pool.

Reference note: the reference is single-accelerator (SURVEY.md §2.4);
this is the beyond-parity multi-chip serving integration — the engines
users actually run (PagedKVBatcher), not just the layout proof
(parallel.heads.make_tp_lm_generate).  Token-exactness vs the
single-device engine is asserted on the virtual mesh
(tests/test_paged_tp.py) and in the driver dryrun.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from resnet_accel_tpu.models.transformer import LN_EPS
from resnet_accel_tpu.ops.bsr_matmul import bsr_matmul_wt_xla
from resnet_accel_tpu.parallel.heads import (_local_gather,
                                             _stack_row_shards)


def build_tp_paged_programs(model, scales, mesh: Mesh, *, page: int,
                            table_pages: int, pool_pages: int,
                            kv_dtype: str, temperature: float,
                            top_k, spec_draft: int = 0) -> Dict:
    """Build the paged engine's device programs sharded over 'tp'.

    Returns a dict with the initial (sharded) ``pool_k``/``pool_v``
    and jitted ``chunk_step`` / ``score_chunk`` / ``spec_step``
    drop-ins for the single-device closures in
    ``PagedKVBatcher.__init__`` — same signatures, same semantics.
    """
    if "tp" not in mesh.axis_names:
        raise ValueError("mesh must have a 'tp' axis")
    tp = mesh.shape["tp"]
    blocks = model.blocks
    L = len(blocks)
    D = model.d_model
    H = blocks[0].n_heads
    for blk in blocks:
        if blk.n_heads % tp:
            raise ValueError(
                f"n_heads={blk.n_heads} not divisible by tp={tp}")
    h_loc, dh = H // tp, D // H
    d_loc = h_loc * dh
    kv_int8 = kv_dtype == "int8"
    greedy = temperature <= 0.0
    ML = model.max_len

    from resnet_accel_tpu.models.lm import (adjust_logits, sampled_token,
                                            spec_accept_sampled)

    # 16 shard arrays per block (4 row-sharded projections x 4 arrays),
    # flattened for shard_map in_specs; leading stack axis sharded 'tp'.
    flat_shards = []
    for blk in blocks:
        for name in ("wq", "wk", "wv", "w1"):
            flat_shards.extend(_stack_row_shards(getattr(blk, name), tp))
    embed = jnp.asarray(model.embed)
    pos_table = jnp.asarray(model.pos)
    lnf_g, lnf_b = jnp.asarray(model.lnf_g), jnp.asarray(model.lnf_b)

    # ------------------------------------------------- pool placement
    kv_spec = P(None, None, None, "tp")
    if kv_int8:
        pool_spec = {"q": kv_spec, "s": P()}

        def make_pool():
            return {
                "q": jax.device_put(
                    jnp.zeros((L, pool_pages, page, D), jnp.int8),
                    NamedSharding(mesh, kv_spec)),
                "s": jax.device_put(
                    jnp.zeros((L, pool_pages, page), jnp.float32),
                    NamedSharding(mesh, P())),
            }
    else:
        pool_spec = kv_spec

        def make_pool():
            return jax.device_put(
                jnp.zeros((L, pool_pages, page, D), jnp.float32),
                NamedSharding(mesh, kv_spec))

    # --------------------------------------------- rank-local helpers
    def ln(v, gamma, beta):
        mu = v.mean(axis=-1, keepdims=True)
        var = v.var(axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * jnp.asarray(gamma) + jnp.asarray(beta)

    def q_static(v, s):
        return jnp.clip(jnp.rint(v / jnp.float32(s)), -128,
                        127).astype(jnp.int8)

    def row_proj(proj_src, shards, q, s):
        """Rank-local slice of a row-sharded projection (int32 acc ->
        fp32 with the shard's scales/bias)."""
        blks, gidx, sc, bias = shards
        g = _local_gather(proj_src.gather, blks, gidx, tp)
        acc = bsr_matmul_wt_xla(q, g)
        return acc.astype(jnp.float32) * (jnp.float32(s) * sc) + bias

    def full_proj_psum(proj_src, q, s):
        """Replicated-weight projection of a zero-filled shard: psum
        the int32 accumulators, dequantize once (bias added once,
        after the reduction)."""
        acc = bsr_matmul_wt_xla(q, proj_src.gather)
        acc = jax.lax.psum(acc, "tp")
        out = acc.astype(jnp.float32) * (
            jnp.float32(s) * jnp.asarray(proj_src.scales))
        if proj_src.bias is not None:
            out = out + jnp.asarray(proj_src.bias)
        return out

    def _store(pool, li, pids, offs, val):
        """Scatter this rank's K/V slice ([B, d_loc] or [B, S, d_loc])
        into its pool shard.  int8 pools quantize with the GLOBAL row
        absmax (pmax over 'tp') so each rank's int8 slice is
        bit-identical to the single-device pool's slice."""
        if not kv_int8:
            return pool.at[li, pids, offs, :].set(val)
        loc = jnp.max(jnp.abs(val), axis=-1)
        s = jnp.maximum(jax.lax.pmax(loc, "tp"), 1e-8) / 127.0
        q = jnp.clip(jnp.rint(val / s[..., None]),
                     -128, 127).astype(jnp.int8)
        return {"q": pool["q"].at[li, pids, offs, :].set(q),
                "s": pool["s"].at[li, pids, offs].set(s)}

    def _view(pool, li, tables):
        """Gather each slot's rank-local page view [B, maxP*page,
        d_loc] (int8 pools dequantize after the gather)."""
        B = tables.shape[0]
        if not kv_int8:
            return pool[li][tables].reshape(B, -1, d_loc)
        q = pool["q"][li][tables].reshape(B, -1, d_loc)
        s = pool["s"][li][tables].reshape(B, -1)
        return q.astype(jnp.float32) * s[..., None]

    def block_win(li, blk, shards, x, pool_k, pool_v, tables, lens,
                  pids, offs):
        """One block over an S-token window per slot.  ``x`` replicated
        [B, S, D]; ``pids``/``offs`` [B, S]; row i of each slot's
        window attends positions <= lens + i (S=1 reduces to the
        single-token decode mask).  Returns (y, pool_k, pool_v)."""
        B, S, _ = x.shape
        sc = scales[li]
        rank = jax.lax.axis_index("tp")

        h = ln(x, blk.ln1_g, blk.ln1_b)
        q8 = q_static(h, sc["h1"]).reshape(B * S, D)
        q_l = row_proj(blk.wq, shards[0], q8, sc["h1"]) \
            .reshape(B, S, d_loc)
        k_l = row_proj(blk.wk, shards[1], q8, sc["h1"]) \
            .reshape(B, S, d_loc)
        v_l = row_proj(blk.wv, shards[2], q8, sc["h1"]) \
            .reshape(B, S, d_loc)
        pool_k = _store(pool_k, li, pids, offs, k_l)
        pool_v = _store(pool_v, li, pids, offs, v_l)
        k_view = _view(pool_k, li, tables)        # [B, Lc, d_loc]
        v_view = _view(pool_v, li, tables)
        Lc = k_view.shape[1]

        qh = q_l.reshape(B, S, h_loc, dh)
        kh = k_view.reshape(B, Lc, h_loc, dh)
        vh = v_view.reshape(B, Lc, h_loc, dh)
        logits = jnp.einsum(
            "bthd,bshd->bhts", qh, kh,
            precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
            jnp.float32(dh))                      # [B, h, S, Lc]
        mask = (jnp.arange(Lc)[None, None, :]
                <= lens[:, None, None] + jnp.arange(S)[None, :, None])
        logits = jnp.where(mask[:, None, :, :], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, vh,
                         precision=jax.lax.Precision.HIGHEST)
        ctx = ctx.reshape(B * S, d_loc)
        ctx_full = jnp.zeros((B * S, D), ctx.dtype)
        ctx_full = jax.lax.dynamic_update_slice(
            ctx_full, ctx, (0, rank * d_loc))
        x = x + full_proj_psum(
            blk.wo, q_static(ctx_full, sc["ctx"]),
            sc["ctx"]).reshape(B, S, D)

        h2 = ln(x, blk.ln2_g, blk.ln2_b)
        q8m = q_static(h2, sc["h2"]).reshape(B * S, D)
        hid = jax.nn.gelu(row_proj(blk.w1, shards[3], q8m, sc["h2"]))
        d_ff = blk.w1.d_out
        hid_full = jnp.zeros((B * S, d_ff), hid.dtype)
        hid_full = jax.lax.dynamic_update_slice(
            hid_full, hid, (0, rank * (d_ff // tp)))
        y = x + full_proj_psum(
            blk.w2, q_static(hid_full, sc["mlp"]),
            sc["mlp"]).reshape(B, S, D)
        return y, pool_k, pool_v

    def regroup(flat):
        """flat shard args -> per-block 4-tuples, stack axis dropped."""
        shards = []
        for b in range(L):
            bf = flat[16 * b:16 * (b + 1)]
            shards.append(tuple(
                tuple(a[0] for a in bf[4 * j:4 * (j + 1)])
                for j in range(4)))
        return shards

    def micro_step(pool_k, pool_v, tables, lens, toks, shards):
        """One lockstep token for every slot (S=1 window)."""
        x = (embed[toks] + pos_table[lens])[:, None, :]   # [B, 1, D]
        prow = jnp.minimum(lens // page, tables.shape[1] - 1)
        pids = jnp.take_along_axis(tables, prow[:, None], axis=1)
        offs = (lens % page)[:, None]
        for li, blk in enumerate(blocks):
            x, pool_k, pool_v = block_win(
                li, blk, shards[li], x, pool_k, pool_v, tables, lens,
                pids, offs)
        h = ln(x[:, 0, :], lnf_g, lnf_b)
        logits = jnp.einsum("bd,vd->bv", h, embed,
                            precision=jax.lax.Precision.HIGHEST)
        return pool_k, pool_v, logits

    def pick(logits, key, adv):
        g = jnp.argmax(logits).astype(jnp.int32)
        if greedy:
            return g, key
        k2, s = sampled_token(logits, key, temperature, top_k)
        return jnp.where(adv, s, g), jnp.where(adv, k2, key)

    # ------------------------------------------------ shard_map wraps
    rep = P()

    def chunk_program(pool_k, pool_v, tables, lens, prev, keys,
                      forced, mask, advance, idle, *flat):
        shards = regroup(flat)

        def body(carry, fma):
            pool_k, pool_v, lens, prev, keys = carry
            f, m, a = fma
            toks = jnp.where(m, f, prev)
            pool_k, pool_v, logits = micro_step(
                pool_k, pool_v, tables, lens, toks, shards)
            nxt, keys = jax.vmap(pick)(logits, keys, a)
            return (pool_k, pool_v, lens + 1, nxt, keys), nxt

        (pool_k, pool_v, lens, _, keys), outs = jax.lax.scan(
            body, (pool_k, pool_v, lens, prev, keys),
            (forced, mask, advance))
        lens = jnp.where(idle, 0, lens)
        return pool_k, pool_v, lens, keys, outs

    shard_in = (P("tp"),) * len(flat_shards)
    chunk_raw = shard_map(
        chunk_program, mesh=mesh,
        in_specs=(pool_spec, pool_spec) + (rep,) * 8 + shard_in,
        out_specs=(pool_spec, pool_spec, rep, rep, rep),
        check_vma=False)
    chunk_step = jax.jit(
        lambda pk, pv, tables, lens, prev, keys, forced, mask, advance,
        idle: chunk_raw(pk, pv, tables, lens, prev, keys, forced, mask,
                        advance, idle, *flat_shards),
        donate_argnums=(0, 1))

    def score_program(pool_k, pool_v, tables, lens, toks, targets,
                      valid, *flat):
        shards = regroup(flat)

        def body(carry, ttv):
            pool_k, pool_v, lens = carry
            t, tgt, v = ttv
            pool_k, pool_v, logits = micro_step(
                pool_k, pool_v, tables, lens, t, shards)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp_t = jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
            return (pool_k, pool_v, lens + 1), jnp.where(v, lp_t, 0.0)

        (pool_k, pool_v, lens), lps = jax.lax.scan(
            body, (pool_k, pool_v, lens),
            (toks.T, targets.T, valid.T))
        return pool_k, pool_v, lps

    score_raw = shard_map(
        score_program, mesh=mesh,
        in_specs=(pool_spec, pool_spec) + (rep,) * 5 + shard_in,
        out_specs=(pool_spec, pool_spec, rep),
        check_vma=False)
    score_chunk = jax.jit(
        lambda pk, pv, tables, lens, toks, targets, valid:
        score_raw(pk, pv, tables, lens, toks, targets, valid,
                  *flat_shards),
        donate_argnums=(0, 1))

    out = {"make_pool": make_pool, "chunk_step": chunk_step,
           "score_chunk": score_chunk, "spec_step": None}

    if spec_draft > 0:
        S = spec_draft + 1

        def accept(z_rows, fed_row, nk, key, emits_flag):
            """Identical acceptance rule to the single-device engine
            (runtime/paged.py) — replicated compute on psum'd
            logits."""
            if greedy:
                g = jnp.argmax(z_rows, axis=-1).astype(jnp.int32)
                forced = jnp.arange(1, S) < nk
                ok = jnp.cumprod(
                    (forced | (fed_row[1:] == g[:-1])).astype(jnp.int32))
                return jnp.sum(ok) + 1, g, key
            z = adjust_logits(z_rows, temperature, top_k)
            n_acc, emit, k2 = spec_accept_sampled(z, fed_row, key,
                                                  n_known=nk)
            return n_acc + 1, emit, jnp.where(emits_flag, k2, key)

        def spec_program(pool_k, pool_v, tables, lens, fed, n_known,
                         keys, emits, idle, *flat):
            shards = regroup(flat)
            pos_idx = lens[:, None] + jnp.arange(S)[None, :]
            x = embed[fed] + pos_table[jnp.minimum(pos_idx, ML - 1)]
            prow = jnp.minimum(pos_idx // page, tables.shape[1] - 1)
            pids = jnp.take_along_axis(tables, prow, axis=1)
            offs = pos_idx % page
            for li, blk in enumerate(blocks):
                x, pool_k, pool_v = block_win(
                    li, blk, shards[li], x, pool_k, pool_v, tables,
                    lens, pids, offs)
            h = ln(x, lnf_g, lnf_b)
            logits = jnp.einsum("bsd,vd->bsv", h, embed,
                                precision=jax.lax.Precision.HIGHEST)
            n_cons, emit, keys = jax.vmap(accept)(
                logits, fed, n_known, keys, emits)
            lens = jnp.where(idle, 0, lens + n_cons)
            return pool_k, pool_v, lens, keys, emit, n_cons

        spec_raw = shard_map(
            spec_program, mesh=mesh,
            in_specs=(pool_spec, pool_spec) + (rep,) * 7 + shard_in,
            out_specs=(pool_spec, pool_spec, rep, rep, rep, rep),
            check_vma=False)
        out["spec_step"] = jax.jit(
            lambda pk, pv, tables, lens, fed, n_known, keys, emits,
            idle: spec_raw(pk, pv, tables, lens, fed, n_known, keys,
                           emits, idle, *flat_shards),
            donate_argnums=(0, 1))

    return out
