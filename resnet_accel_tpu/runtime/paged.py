"""Paged-KV continuous batching — block-table K/V for the INT8 LM.

The fixed-slot engine (runtime.serving.ContinuousBatcher) allocates
every slot a contiguous ``[max_len, d_model]`` cache, so pool memory is
``slots x max_len`` and the longest admissible request is a
construction-time constant.  This engine pages the KV instead
(vLLM-style, realized with XLA scatter/gather instead of a CUDA
kernel):

- One K and one V **page pool** per engine, shaped
  ``[n_layers, n_pages, page, d_model]``; page 0 is a reserved dummy
  that absorbs idle-slot writes and is never allocated.
- Each slot holds a **block table** row ``[max_pages]`` of pool page
  ids.  A slot's K/V "view" for attention is ``pool[table[slot]]``
  reshaped to ``[max_pages * page, d_model]`` — positions past the
  slot's length are masked exactly like the contiguous path.
- The host side keeps a **free-page list**: a request is admitted only
  when ``ceil((prompt + n_new) / page)`` pages are free (admission
  control); its pages return to the free list on completion.  Memory
  is therefore oversubscribable: total pool pages can be far less than
  ``slots x max_pages x page``, and long and short requests share it.
- **Quantized KV pages** (``kv_dtype="int8"``): per-token symmetric
  int8 values + one fp32 scale per (layer, page, position),
  dequantized after the gather — ~3.9x less pool memory and 4x less
  KV gather traffic, measured −4% throughput with full token
  agreement on the bench workload (tools/paged_bench.py).  Lossy by
  design: the ONE serving knob that is not bit-equal to ``generate``;
  agreement is measured, never assumed.
- **Prefix caching** (``prefix_cache=True``, vLLM-style): retired
  requests' pure-prompt pages stay cached keyed by their exact token
  chain; a later request whose prompt starts with the same tokens
  shares those pages read-only (refcounted) and SKIPS their prefill
  micro-steps entirely — the dominant cost for system-prompt
  workloads.  Unreferenced cached pages are reclaimed LRU-first under
  pool pressure, so caching never blocks admission.

Decode math is IDENTICAL to the contiguous path: both call
``TransformerBlockInt8.qkv_project`` / ``attend_mlp``, and sampling
uses the same ``models.lm.sampled_token`` chain — so paged results
equal ``generate``/``sample`` streams and the fixed-slot engine's
results token for token (tested).

Scheduling (chunked lockstep, EOS early-stop, per-request seeds) is
shared with ContinuousBatcher through the same host-side structure.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from resnet_accel_tpu.runtime.serving import (_IterationScheduler,
                                              _Request)


class PagedKVBatcher(_IterationScheduler):
    """Continuous batcher over a paged KV pool.

    Args:
        model: models.lm.TransformerLMInt8 (its position table bounds
            the longest single sequence).
        scales: static activation scales (model.calibrate output).
        slots: lockstep decode lanes.
        page: positions per KV page.
        pool_pages: total pages in the pool (incl. the dummy page 0).
        max_pages: block-table width = longest admissible request in
            pages.  NOT a memory commitment — memory is pool_pages.
        chunk: micro-steps per device dispatch.
        temperature/top_k: engine-level sampling (0 = greedy).
        tp_mesh: optional jax.sharding.Mesh with a 'tp' axis — shard
            THIS engine over it (per-rank KV page pools sliced by
            head, one int32 psum per output projection; see
            runtime.paged_tp).  Token-exact vs the single-device
            engine; the host scheduler is identical.
    """

    def __init__(self, model, scales, slots: int = 4, page: int = 16,
                 pool_pages: int = 64, max_pages: Optional[int] = None,
                 chunk: int = 8, temperature: float = 0.0,
                 top_k: Optional[int] = None, reserve: str = "full",
                 prefix_cache: bool = False, kv_dtype: str = "fp32",
                 spec_draft: int = 0, spec_ngram: int = 3,
                 spec_adaptive: bool = False,
                 spec_min_take: Optional[float] = None,
                 spec_reprobe: int = 50, spec_probe: int = 3,
                 tp_mesh=None):
        if slots < 1:
            raise ValueError("slots must be >= 1")
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        if page < 1:
            raise ValueError("page must be >= 1")
        if reserve not in ("full", "ondemand"):
            raise ValueError(
                f"reserve must be 'full' or 'ondemand', got {reserve!r}")
        if spec_draft < 0:
            raise ValueError("spec_draft must be >= 0")
        if spec_draft and spec_ngram < 1:
            raise ValueError("spec_ngram must be >= 1")
        self.model = model
        self.scales = scales
        self.slots = int(slots)
        self.page = int(page)
        self.reserve = reserve
        self.pool_pages = int(pool_pages)
        if max_pages is None:
            max_pages = model.max_len // self.page
        self.max_pages = int(max_pages)
        self.max_len = min(self.max_pages * self.page, model.max_len)
        self.chunk = int(chunk)
        # Speculative decoding (spec_draft > 0): every engine iteration
        # runs ONE batched verify of S = spec_draft + 1 tokens per slot
        # instead of `chunk` sequential micro-steps.  The verify window
        # writes K/V up to S - 1 positions past a request's final
        # length (the overhang), so admission reserves ceil((total +
        # S - 1) / page) pages and the block table is widened by the
        # overhang pages — a near-max_len request's overhang writes
        # must land in pages it owns, never clobber the last valid
        # page (the contiguous path's max_len guard, paged form).
        self.spec_draft = int(spec_draft)
        self.spec_ngram = int(spec_ngram)
        spec = self.spec_draft > 0
        S = self.spec_draft + 1
        # Adaptive speculation (spec_adaptive=True): measured round-5
        # verdict (docs/SERVING.md) — the non-spec engine amortizes
        # `chunk` micro-steps per dispatch, so a verify window must
        # emit more than `chunk` tokens per dispatch to pay for itself,
        # which only happens when prompt-lookup acceptance runs long.
        # This mode tracks an EWMA of tokens-consumed-per-verify and
        # falls back to the chunked program when it drops below
        # `spec_min_take` (default: `chunk`), re-probing speculation
        # every `spec_reprobe` chunked dispatches.  Greedy only: both
        # programs emit the model's exact argmax chain, so streams are
        # bit-identical to either pure mode no matter where the engine
        # switches.
        self.spec_adaptive = bool(spec_adaptive)
        if self.spec_adaptive:
            if not spec:
                raise ValueError("spec_adaptive requires spec_draft > 0")
            if temperature > 0:
                raise ValueError(
                    "spec_adaptive is greedy-only (sampled streams "
                    "consume randomness differently per mode, so "
                    "switching would change them)")
            if spec_probe < 1 or spec_reprobe < 1:
                raise ValueError("spec_probe and spec_reprobe must "
                                 "be >= 1")
        self.spec_min_take = (float(spec_min_take)
                              if spec_min_take is not None
                              else float(chunk))
        self.spec_reprobe = int(spec_reprobe)
        self.spec_probe = int(spec_probe)
        self._spec_mode = True        # adaptive: currently speculating?
        self._spec_ewma: Optional[float] = None
        self._spec_samples = 0
        self._chunk_left = 0
        self.spec_switches = 0        # mode flips (observability)
        self._overhang = S - 1 if spec else 0
        self._win = S if spec else self.chunk
        self._table_pages = self.max_pages + (
            -(-self._overhang // self.page) if spec else 0)
        self.temperature = float(temperature)
        if top_k is not None and top_k < 1:
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        self.top_k = top_k
        if pool_pages < 2:
            raise ValueError("pool needs at least 2 pages (page 0 is "
                             "the reserved dummy)")

        if kv_dtype not in ("fp32", "int8"):
            raise ValueError(
                f"kv_dtype must be 'fp32' or 'int8', got {kv_dtype!r}")
        self.kv_dtype = kv_dtype
        kv_int8 = kv_dtype == "int8"

        # Tensor-parallel serving (tp_mesh set): the host scheduler below
        # is untouched; only the KV pool placement and the three jitted
        # device programs are swapped for shard_map programs over the
        # mesh's 'tp' axis — per-rank KV page pools sliced by head, one
        # int32 psum per wo/w2 projection (runtime.paged_tp).
        self.tp_mesh = tp_mesh
        tp_progs = None
        if tp_mesh is not None:
            from resnet_accel_tpu.runtime.paged_tp import \
                build_tp_paged_programs
            tp_progs = build_tp_paged_programs(
                model, scales, tp_mesh, page=self.page,
                table_pages=self._table_pages,
                pool_pages=self.pool_pages, kv_dtype=kv_dtype,
                temperature=self.temperature, top_k=self.top_k,
                spec_draft=self.spec_draft)

        L = len(model.blocks)
        D = model.blocks[0].d_model
        if tp_mesh is not None:
            self._pool_k = tp_progs["make_pool"]()
            self._pool_v = tp_progs["make_pool"]()
        elif kv_int8:
            # Quantized KV pages: int8 values + one fp32 scale per
            # (layer, page, position) — per-token symmetric rowwise
            # quantization at write time, dequantized AFTER the gather
            # (the HBM gather moves 4x fewer KV bytes and the pool
            # commits ~(D+4)/(4D) of the fp32 memory: ~3.9x smaller at
            # d_model 256).  Lossy by design (documented; quality
            # measured in tools/kv8_quality.py) — unlike everything else
            # in the serving path it is NOT bit-equal to generate().
            def _zero_pool():
                return {
                    "q": jnp.zeros(
                        (L, self.pool_pages, self.page, D), jnp.int8),
                    "s": jnp.zeros(
                        (L, self.pool_pages, self.page), jnp.float32),
                }
            self._pool_k = _zero_pool()
            self._pool_v = _zero_pool()
        else:
            self._pool_k = jnp.zeros(
                (L, self.pool_pages, self.page, D), jnp.float32)
            self._pool_v = jnp.zeros_like(self._pool_k)
        self._tables = jnp.zeros((self.slots, self._table_pages),
                                 jnp.int32)          # 0 = dummy page
        self._lens = jnp.zeros(self.slots, jnp.int32)
        self._free: List[int] = list(range(1, self.pool_pages))
        self._slot_pages: Dict[int, List[int]] = {}
        self._slot_len: Dict[int, int] = {}   # host mirror of device lens
        self.preemptions = 0                  # recompute evictions

        # Prefix cache (opt-in, vLLM-style): pages holding KV for a
        # PURE-PROMPT token range are retained after the request retires
        # and shared read-only with any later request whose prompt
        # starts with the same tokens (KV at position i depends only on
        # tokens[0..i] + absolute positions, so equal token prefixes
        # have bit-equal KV).  A new request's admission points its
        # block-table prefix at the cached pages, bumps their refcounts,
        # and starts with ``req.fed`` past the shared range — the
        # prefill micro-steps for those tokens are SKIPPED entirely.
        # Sharing is write-safe by construction: a slot only scatters at
        # its own ``lens`` positions, which start past the shared range.
        # Cached pages with refcount 0 are reclaimed LRU-first when the
        # free list runs dry, so the cache never blocks admission.
        self.prefix_cache = bool(prefix_cache)
        self._cache: Dict[bytes, int] = {}      # chain key -> page id
        self._page_ref: Dict[int, int] = {}     # page id -> live refs
        self._lru: Dict[bytes, None] = {}       # insertion-ordered LRU
        self._slot_req: Dict[int, _Request] = {}
        self._slot_shared: Dict[int, int] = {}  # leading shared pages
        self._slot_cache_bound: Dict[int, int] = {}  # preempt-time fed
        self.cache_hits = 0                     # shared pages reused
        self.cache_tokens_skipped = 0           # prefill steps skipped

        greedy = self.temperature <= 0.0
        temp, top_k_ = self.temperature, self.top_k
        blocks = model.blocks
        embed = jnp.asarray(model.embed)
        pos_table = jnp.asarray(model.pos)
        page_sz = self.page

        from resnet_accel_tpu.models.lm import sampled_token

        def pick(logits, key, adv):
            g = jnp.argmax(logits).astype(jnp.int32)
            if greedy:
                return g, key
            k2, s = sampled_token(logits, key, temp, top_k_)
            return (jnp.where(adv, s, g),
                    jnp.where(adv, k2, key))

        def _store(pool, li, pids, offs, val):
            """Scatter K or V rows into the pool: [B, D] with [B]
            page ids/offsets (one token per slot), or [B, S, D] with
            [B, S] ids/offsets (a verify window per slot)."""
            if not kv_int8:
                return pool.at[li, pids, offs, :].set(val)
            s = jnp.maximum(jnp.max(jnp.abs(val), axis=-1),
                            1e-8) / 127.0                 # [B] / [B,S]
            q = jnp.clip(jnp.rint(val / s[..., None]),
                         -128, 127).astype(jnp.int8)
            return {"q": pool["q"].at[li, pids, offs, :].set(q),
                    "s": pool["s"].at[li, pids, offs].set(s)}

        def _view(pool, li, tables, d):
            """Gather each slot's page view [B, maxP*page, D] (int8
            pools dequantize after the gather)."""
            B = tables.shape[0]
            if not kv_int8:
                return pool[li][tables].reshape(B, -1, d)
            q = pool["q"][li][tables].reshape(B, -1, d)
            s = pool["s"][li][tables].reshape(B, -1)
            return q.astype(jnp.float32) * s[..., None]

        def micro_step(pool_k, pool_v, tables, lens, toks):
            """One lockstep token for every slot. [B] -> logits [B,V]."""
            x = embed[toks] + pos_table[lens]          # [B, D]
            x = x[:, None, :]                          # [B, 1, D]
            # A finished request dragged to the chunk boundary can push
            # len past its allocation; clamping the page index keeps the
            # (discarded) writes inside the slot's own pages/dummy.
            prow = jnp.minimum(lens // page_sz, tables.shape[1] - 1)
            pids = jnp.take_along_axis(
                tables, prow[:, None], axis=1)[:, 0]
            offs = lens % page_sz
            for li, blk in enumerate(blocks):
                q, k, v = jax.vmap(
                    lambda xt: blk.qkv_project(xt, scales[li]))(x)
                # scatter this token's K/V into the pool pages
                pool_k = _store(pool_k, li, pids, offs, k[:, 0, :])
                pool_v = _store(pool_v, li, pids, offs, v[:, 0, :])
                k_view = _view(pool_k, li, tables, k.shape[-1])
                v_view = _view(pool_v, li, tables, v.shape[-1])
                x = jax.vmap(
                    lambda xt, qt, kv, vv, p: blk.attend_mlp(
                        xt, qt, kv, vv, p, scales[li])
                )(x, q, k_view, v_view, lens)
            logits = jax.vmap(lambda xt: model._logits(xt)[0])(x)
            return pool_k, pool_v, logits

        def chunk_step(pool_k, pool_v, tables, lens, prev, keys,
                       forced, mask, advance, idle):
            def body(carry, fma):
                pool_k, pool_v, lens, prev, keys = carry
                f, m, a = fma
                toks = jnp.where(m, f, prev)
                pool_k, pool_v, logits = micro_step(
                    pool_k, pool_v, tables, lens, toks)
                nxt, keys = jax.vmap(pick)(logits, keys, a)
                return (pool_k, pool_v, lens + 1, nxt, keys), nxt

            (pool_k, pool_v, lens, _, keys), outs = jax.lax.scan(
                body, (pool_k, pool_v, lens, prev, keys),
                (forced, mask, advance))
            lens = jnp.where(idle, 0, lens)
            return pool_k, pool_v, lens, keys, outs

        self._chunk_step = jax.jit(chunk_step, donate_argnums=(0, 1))

        def score_chunk(pool_k, pool_v, tables, lens, toks, targets,
                        valid):
            """Teacher-forced scoring chunk: feed ``toks`` [B, C] through
            the SAME paged micro_step (page-table gather/scatter,
            kv_dtype quantization) and return the fp32 log-probs each
            position assigns its ``targets`` token, 0 where ``valid``
            is False.  The perplexity endpoint measured on the exact
            serving arithmetic."""
            def body(carry, ttv):
                pool_k, pool_v, lens = carry
                t, tgt, v = ttv
                pool_k, pool_v, logits = micro_step(
                    pool_k, pool_v, tables, lens, t)
                lp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1)
                lp_t = jnp.take_along_axis(
                    lp, tgt[:, None], axis=1)[:, 0]
                return (pool_k, pool_v, lens + 1), \
                    jnp.where(v, lp_t, 0.0)

            (pool_k, pool_v, lens), lps = jax.lax.scan(
                body, (pool_k, pool_v, lens),
                (toks.T, targets.T, valid.T))
            return pool_k, pool_v, lps           # lps [C, B]

        self._score_chunk = jax.jit(score_chunk, donate_argnums=(0, 1))

        if spec:
            from resnet_accel_tpu.models.lm import (adjust_logits,
                                                    spec_accept_sampled)
            ML = model.max_len

            def accept(z_rows, fed_row, nk, key, emits_flag):
                """Per-slot acceptance on [S, V] verify logits.
                Greedy: a draft survives while it equals the model's
                own argmax chain; rows i < nk are KNOWN tokens (prompt
                ingestion) and accept unconditionally — chunked prefill
                and speculative decode are one rule.  Sampled: the
                shared ``spec_accept_sampled`` (distribution-exact);
                the PRNG chain only advances on slots whose window can
                emit, so a request's stream is independent of how many
                pure-prefill iterations preceded it."""
                if greedy:
                    g = jnp.argmax(z_rows, axis=-1).astype(jnp.int32)
                    forced = jnp.arange(1, S) < nk
                    ok = jnp.cumprod(
                        (forced | (fed_row[1:] == g[:-1])).astype(
                            jnp.int32))
                    return jnp.sum(ok) + 1, g, key
                z = adjust_logits(z_rows, temp, top_k_)
                n_acc, emit, k2 = spec_accept_sampled(z, fed_row, key,
                                                      n_known=nk)
                return (n_acc + 1, emit,
                        jnp.where(emits_flag, k2, key))

            def spec_step(pool_k, pool_v, tables, lens, fed, n_known,
                          keys, emits, idle):
                """ONE speculative macro-step for every slot: verify
                S = spec_draft + 1 tokens per slot (host-built windows
                of known prompt tokens + prompt-lookup drafts) in one
                batched forward over the paged KV, accept on-device,
                advance each slot by its accepted count.  K/V scatters
                are per-token-position, so a window spans page
                boundaries naturally; rejected positions stay in the
                pool but are masked by ``lens`` and overwritten by the
                next window at the same positions.  Positions past the
                position table (final-window overhang) clamp to its
                last row — those rows can only produce tokens past the
                request's budget, which the host discards."""
                pos_idx = lens[:, None] + jnp.arange(S)[None, :]
                x = embed[fed] \
                    + pos_table[jnp.minimum(pos_idx, ML - 1)]  # [B,S,D]
                prow = jnp.minimum(pos_idx // page_sz,
                                   tables.shape[1] - 1)
                pids = jnp.take_along_axis(tables, prow, axis=1)
                offs = pos_idx % page_sz                   # [B, S]
                for li, blk in enumerate(blocks):
                    q, k, v = jax.vmap(
                        lambda xs: blk.qkv_project(xs, scales[li]))(x)
                    pool_k = _store(pool_k, li, pids, offs, k)
                    pool_v = _store(pool_v, li, pids, offs, v)
                    k_view = _view(pool_k, li, tables, k.shape[-1])
                    v_view = _view(pool_v, li, tables, v.shape[-1])
                    x = jax.vmap(
                        lambda xs, qs, kv, vv, p: blk.attend_mlp_multi(
                            xs, qs, kv, vv, p, scales[li])
                    )(x, q, k_view, v_view, lens)
                logits = jax.vmap(model._logits)(x)        # [B, S, V]
                n_cons, emit, keys = jax.vmap(accept)(
                    logits, fed, n_known, keys, emits)
                lens = jnp.where(idle, 0, lens + n_cons)
                return pool_k, pool_v, lens, keys, emit, n_cons

            self._spec_step = jax.jit(spec_step, donate_argnums=(0, 1))

        if tp_progs is not None:
            # Same signatures, same semantics, sharded over 'tp'.
            self._chunk_step = tp_progs["chunk_step"]
            self._score_chunk = tp_progs["score_chunk"]
            if spec:
                self._spec_step = tp_progs["spec_step"]

        self._queue: List[_Request] = []
        self._active: Dict[int, _Request] = {}
        self._results: Dict[int, List[int]] = {}
        self._prev = np.zeros(self.slots, np.int32)
        self._keys = jnp.zeros((self.slots, 2), jnp.uint32)
        self._next_rid = 0
        self.steps = 0
        self.micro_steps = 0

    # ------------------------------------------------------------- api
    def submit(self, prompt: Sequence[int], n_new: int,
               seed: int = 0, eos: Optional[int] = None) -> int:
        """Enqueue a request; admitted when enough KV pages are free."""
        prompt = self._validated_prompt(prompt, n_new,
                                        "the block-table capacity")
        need = -(-(len(prompt) + n_new + self._overhang) // self.page)
        if need > self.pool_pages - 1:
            raise ValueError(
                f"request needs {need} KV pages (incl. the speculative "
                f"verify overhang) but the pool only has "
                f"{self.pool_pages - 1} allocatable — it could never "
                "be admitted")
        return self._enqueue(prompt, n_new, seed, eos)

    def score(self, seqs: Sequence[Sequence[int]]) -> List[np.ndarray]:
        """Teacher-forced per-token log-probs through the paged path.

        For each sequence, feeds tokens[:-1] as forced inputs through
        the engine's exact device program — paged KV scatter/gather,
        ``kv_dtype`` quantization, chunked dispatch — and returns the
        fp32 log-prob of tokens[1:] (length S-1; empty for S < 2).
        This is the perplexity / bits-per-byte endpoint measured ON the
        serving arithmetic: with ``kv_dtype='int8'``, later positions
        attend over quantized pages exactly as decode does.

        Requires an idle engine (no queued or active requests); KV
        pages are taken from and returned to the engine pool.
        """
        if self._active or self._queue:
            raise RuntimeError("score() requires an idle engine")
        results: List[Optional[np.ndarray]] = [None] * len(seqs)
        pending = [(i, list(map(int, s))) for i, s in enumerate(seqs)]
        for i, s in pending:
            if len(s) > self.max_len:
                raise ValueError(
                    f"sequence {i} has {len(s)} tokens; the engine "
                    f"tables cap at {self.max_len}")
        pending = [(i, s) for i, s in pending if len(s) >= 2] or []
        for i, s in enumerate(seqs):
            if len(list(s)) < 2:
                results[i] = np.zeros(0, np.float32)
        while pending:
            batch = pending[:self.slots]
            pending = pending[len(batch):]
            tables_np = np.zeros((self.slots, self._table_pages),
                                 np.int32)
            allocs: List[List[int]] = []
            for s_i, (_, seq) in enumerate(batch):
                need = -(-(len(seq) - 1) // self.page)
                if need > len(self._free) + len(self._cache):
                    raise RuntimeError(
                        f"scoring needs {need} free KV pages, have "
                        f"{len(self._free)}")
                pages = self._alloc_pages(need)
                allocs.append(pages)
                tables_np[s_i, :need] = pages
            longest = max(len(seq) - 1 for _, seq in batch)
            B, C = self.slots, self.chunk
            lens = jnp.zeros(B, jnp.int32)
            tables = jnp.asarray(tables_np)
            acc = [[] for _ in batch]
            for off in range(0, longest, C):
                toks = np.zeros((B, C), np.int32)
                tgts = np.zeros((B, C), np.int32)
                valid = np.zeros((B, C), bool)
                for s_i, (_, seq) in enumerate(batch):
                    n = max(min(len(seq) - 1 - off, C), 0)
                    if n:
                        toks[s_i, :n] = seq[off:off + n]
                        tgts[s_i, :n] = seq[off + 1:off + 1 + n]
                        valid[s_i, :n] = True
                self._pool_k, self._pool_v, lps = self._score_chunk(
                    self._pool_k, self._pool_v, tables, lens,
                    jnp.asarray(toks), jnp.asarray(tgts),
                    jnp.asarray(valid))
                lens = lens + C
                lps_np = np.asarray(lps)             # [C, B]
                for s_i in range(len(batch)):
                    acc[s_i].append(lps_np[:, s_i])
                self.steps += 1
                self.micro_steps += C
            for s_i, (idx, seq) in enumerate(batch):
                results[idx] = np.concatenate(acc[s_i])[:len(seq) - 1] \
                    .astype(np.float32)
                self._free.extend(allocs[s_i])
        return [r for r in results]

    def _pages_needed(self, req: _Request) -> int:
        return -(-(len(req.prompt) + req.n_new + self._overhang)
                 // self.page)

    def free_pages(self) -> int:
        return len(self._free)

    def kv_pool_bytes(self) -> int:
        """Device bytes committed to the K+V page pools."""
        leaves = jax.tree_util.tree_leaves((self._pool_k, self._pool_v))
        return sum(x.size * x.dtype.itemsize for x in leaves)

    # ------------------------------------------------ prefix cache ops
    def _chain_key(self, prompt: Sequence[int], k: int) -> bytes:
        """Cache key for page k: the EXACT token sequence it closes."""
        return np.asarray(prompt[:(k + 1) * self.page],
                          np.int32).tobytes()

    def _reclaimable(self) -> int:
        return sum(1 for key in self._lru
                   if self._page_ref.get(self._cache[key], 0) == 0)

    def _available(self) -> int:
        """Pages allocatable right now: free + reclaimable cached."""
        return len(self._free) + self._reclaimable()

    def _evict_cached(self) -> None:
        """Reclaim the least-recently-used unreferenced cached page."""
        for key in self._lru:
            pid = self._cache[key]
            if self._page_ref.get(pid, 0) == 0:
                del self._cache[key]
                del self._lru[key]
                self._page_ref.pop(pid, None)
                self._free.append(pid)
                return
        raise RuntimeError(
            "no free or reclaimable KV pages (callers must check "
            "_available() before allocating)")

    def _alloc_pages(self, n: int) -> List[int]:
        out = []
        for _ in range(n):
            if not self._free:
                self._evict_cached()
            out.append(self._free.pop())
        return out

    def _cached_prefix(self, req: _Request) -> List[int]:
        """Longest run of cached pages matching the prompt head.  At
        least one prompt token is always left to feed (its logits
        start generation)."""
        if not self.prefix_cache:
            return []
        hits: List[int] = []
        for k in range((len(req.prompt) - 1) // self.page):
            pid = self._cache.get(self._chain_key(req.prompt, k))
            if pid is None:
                break
            hits.append(pid)
        return hits

    def _admit(self) -> None:
        for slot in range(self.slots):
            if slot in self._active or not self._queue:
                continue
            req = self._queue[0]
            shared = self._cached_prefix(req)
            fed0 = len(shared) * self.page
            total = len(req.prompt) + req.n_new + self._overhang
            if self.reserve == "full":
                need = -(-total // self.page) - len(shared)
            else:
                need = (-(-min(total, fed0 + self._win) // self.page)
                        - len(shared))
            need = max(need, 0)
            if need > self._available():
                break                     # FIFO: wait for pages
            self._queue.pop(0)
            for k, pid in enumerate(shared):
                self._page_ref[pid] = self._page_ref.get(pid, 0) + 1
                key = self._chain_key(req.prompt, k)
                self._lru.pop(key, None)
                self._lru[key] = None     # LRU touch
            pages = shared + self._alloc_pages(need)
            self.cache_hits += len(shared)
            self.cache_tokens_skipped += fed0
            req.fed = fed0                # shared KV: skip its prefill
            self._slot_pages[slot] = pages
            self._slot_shared[slot] = len(shared)
            self._slot_req[slot] = req
            self._slot_len[slot] = fed0
            row = np.zeros(self._table_pages, np.int32)
            row[:len(pages)] = pages
            self._tables = self._tables.at[slot].set(jnp.asarray(row))
            self._lens = self._lens.at[slot].set(fed0)
            self._active[slot] = req
            self._prev[slot] = 0
            # A preempted request resumes its PRNG chain mid-stream so
            # the recomputed continuation samples exactly the tokens the
            # uninterrupted run would have.
            key = (jnp.asarray(req.saved_key)
                   if req.saved_key is not None
                   else jax.random.PRNGKey(req.seed))
            req.saved_key = None
            self._keys = self._keys.at[slot].set(key)

    def _preempt(self, slot: int) -> None:
        """Evict a RUNNING request by recompute (vLLM-style): fold its
        generated tokens into the prompt, save the PRNG chain, release
        its pages, and re-queue it at its FIFO position (by rid).  On
        re-admission the prompt (original + generated so far) re-feeds
        through the normal prefill path and generation continues
        token-exactly."""
        req = self._active.pop(slot)
        self.preemptions += 1
        # Positions < fed hold valid prompt KV right now; remember the
        # bound BEFORE the fold below rewrites fed, so _on_slot_free can
        # cache those pages and the resumed request reuses them instead
        # of recomputing (preemption-by-recompute becomes
        # preemption-by-cache-reuse when the pages survive).
        self._slot_cache_bound[slot] = req.fed
        req.saved_key = np.asarray(self._keys[slot])
        req.emitted.extend(req.out)
        req.prompt = req.prompt + req.out
        total = req.total_new if req.total_new is not None else req.n_new
        req.n_new = total - len(req.emitted)
        req.out = []
        req.fed = 0
        self._on_slot_free(slot)
        self._slot_len.pop(slot, None)
        self._lens = self._lens.at[slot].set(0)
        pos = 0
        while pos < len(self._queue) and self._queue[pos].rid < req.rid:
            pos += 1
        self._queue.insert(pos, req)

    def _ensure_pages(self) -> None:
        """Ondemand mode: grow each active slot's allocation to cover
        the next chunk, preempting NEWER requests (largest rid first)
        when the pool runs dry.  The oldest active request can always
        progress (submit() bounds any single request's total need by
        the pool size), so there is no livelock: a slot that cannot be
        satisfied even after evicting every newer one parks itself back
        on the queue instead of writing into pages it does not own."""
        for slot in sorted(self._active,
                           key=lambda s: self._active[s].rid):
            if slot not in self._active:
                continue          # preempted by an earlier iteration
            req = self._active[slot]
            total = len(req.prompt) + req.n_new + self._overhang
            target = min(total, self._slot_len[slot] + self._win)
            need = -(-target // self.page)
            grow = need - len(self._slot_pages[slot])
            while grow > self._available():
                victims = [s for s in self._active
                           if self._active[s].rid > req.rid]
                if not victims:
                    self._preempt(slot)   # park self; retry later
                    break
                self._preempt(max(
                    victims, key=lambda s: self._active[s].rid))
            if slot not in self._active or grow <= 0:
                continue
            self._slot_pages[slot].extend(self._alloc_pages(grow))
            row = np.zeros(self._table_pages, np.int32)
            pages = self._slot_pages[slot]
            row[:len(pages)] = pages
            self._tables = self._tables.at[slot].set(jnp.asarray(row))

    def _on_slot_free(self, slot: int) -> None:
        """Scheduler hook: release a leaving request's pages.

        Shared (cached) pages drop a refcount and stay in the cache.
        With the prefix cache on, this request's own PURE-PROMPT pages
        — fully inside both the prompt and the positions actually
        written (``fed``; preemption records its pre-fold bound) — are
        inserted into the cache for future prompts instead of freed.
        Everything else returns to the free list."""
        pages = self._slot_pages.pop(slot, [])
        req = self._slot_req.pop(slot, None)
        bound = self._slot_cache_bound.pop(slot, None)
        shared = self._slot_shared.pop(slot, 0)
        for pid in pages[:shared]:
            self._page_ref[pid] = max(self._page_ref.get(pid, 1) - 1, 0)
        own = pages[shared:]
        keep = 0
        if self.prefix_cache and req is not None:
            if bound is None:
                bound = req.fed
            cacheable = min(bound, len(req.prompt)) // self.page
            for k in range(shared, min(cacheable, shared + len(own))):
                pid = own[k - shared]
                key = self._chain_key(req.prompt, k)
                if key in self._cache:
                    self._free.append(pid)   # duplicate: keep the old
                else:
                    self._cache[key] = pid
                    self._page_ref[pid] = 0
                    self._lru[key] = None
                keep += 1
        self._free.extend(own[keep:])
        self._slot_len.pop(slot, None)
        self._tables = self._tables.at[slot].set(
            jnp.zeros(self._table_pages, jnp.int32))

    # ------------------------------------------------ speculative mode
    def _draft(self, ctx: List[int], need: int) -> List[int]:
        """Prompt-lookup drafts (host-side): the continuation of the
        most recent strictly-earlier occurrence of the last
        ``spec_ngram`` tokens of ``ctx``, padded by repeating the last
        token (cheap filler — usually rejected, and the verify pass
        runs regardless).  Same proposal rule as the single-stream
        ``TransformerLMInt8.generate_speculative`` lookup, computed on
        the host because the paged engine's chain (prompt + emitted)
        lives host-side between dispatches."""
        if need <= 0:
            return []
        n, g = len(ctx), self.spec_ngram
        if n > g:
            a = np.asarray(ctx, np.int32)
            # windows starting at 0..n-g-1 (strictly before the suffix)
            wins = np.stack([a[j:j + n - g] for j in range(g)], axis=1)
            hits = np.flatnonzero(np.all(wins == a[None, -g:], axis=1))
            if hits.size:
                p = int(hits[-1])
                cont = ctx[p + g:p + g + need]
                return cont + [ctx[-1]] * (need - len(cont))
        return [ctx[-1]] * need

    def _step_spec(self) -> bool:
        """One speculative engine iteration: build each active slot's
        S-token verify window (unfed known tokens first — prompt still
        being ingested, or the newest emitted token — then prompt-lookup
        drafts continuing the chain), run ONE batched paged verify, and
        consume each slot's device-accepted count.  ``_slot_len`` is
        the host mirror of the device ``lens`` (= tokens with valid
        KV); emitted tokens are the accept vector's rows that predict
        positions at/past the prompt end, truncated host-side at the
        request budget / EOS."""
        self._admit()
        if self.reserve == "ondemand":
            self._ensure_pages()
        if not self._active:
            return bool(self._queue)

        S = self.spec_draft + 1
        fed = np.zeros((self.slots, S), np.int32)
        n_known = np.zeros(self.slots, np.int32)
        emits = np.zeros(self.slots, bool)
        consumed0: Dict[int, int] = {}
        for slot, req in self._active.items():
            ctx = req.prompt + req.out
            consumed = self._slot_len[slot]
            consumed0[slot] = consumed
            known = ctx[consumed:consumed + S]
            nk = len(known)
            fed[slot] = known + self._draft(ctx, S - nk)
            n_known[slot] = nk
            # some verify row predicts a position at/past the prompt
            # end -> this window can emit (and consumes randomness)
            emits[slot] = consumed + S >= len(req.prompt)
        idle = np.array([s not in self._active
                         for s in range(self.slots)])

        (self._pool_k, self._pool_v, self._lens, self._keys, emit,
         n_cons) = self._spec_step(
            self._pool_k, self._pool_v, self._tables, self._lens,
            jnp.asarray(fed), jnp.asarray(n_known), self._keys,
            jnp.asarray(emits), jnp.asarray(idle))
        self.steps += 1
        self.micro_steps += S
        emit = np.asarray(emit)
        n_cons = np.asarray(n_cons)
        self._last_take = (float(np.mean([n_cons[s] for s in consumed0]))
                           if consumed0 else None)

        for slot in list(self._active):
            req = self._active[slot]
            consumed = consumed0[slot]
            take = int(n_cons[slot])
            # fed first: req.done (budget/EOS truncation below) checks
            # prefilling = fed < len(prompt), which must reflect THIS
            # window's prompt consumption before any append
            req.fed = min(len(req.prompt), consumed + take)
            for p in range(take):
                # the token at chain position consumed + 1 + p: a
                # prompt token (pure consumption) or a newly generated
                # one (append until the request is done)
                if consumed + 1 + p >= len(req.prompt) and not req.done:
                    req.out.append(int(emit[slot, p]))
            self._slot_len[slot] = consumed + take
            if req.done:
                total = req.total_new if req.total_new is not None \
                    else req.n_new
                self._results[req.rid] = \
                    (req.emitted + req.out)[:total]
                del self._active[slot]
                self._on_slot_free(slot)
        return bool(self._active or self._queue)

    def step_engine(self) -> bool:
        """One engine iteration (ONE device dispatch).  Returns False
        when idle.  Scheduling is the shared _IterationScheduler; this
        adds page admission/growth/release (and, in ondemand mode,
        preemption) around it.  With ``spec_draft > 0`` the iteration
        is a speculative verify window instead of ``chunk``
        micro-steps (see _step_spec); ``spec_adaptive`` switches
        between the two programs on the measured acceptance EWMA."""
        if self.spec_draft and not self.spec_adaptive:
            return self._step_spec()
        if self.spec_draft:
            return self._step_adaptive()
        return self._step_chunked()

    def _step_adaptive(self) -> bool:
        """Adaptive-mode iteration: speculate while the acceptance
        EWMA says it pays, otherwise run chunked dispatches and
        re-probe periodically.  Greedy streams are identical either
        way (both programs emit the model's argmax chain)."""
        if not self._spec_mode:
            alive = self._step_chunked()
            self._chunk_left -= 1
            if self._chunk_left <= 0:
                self._spec_mode = True
                self._spec_ewma, self._spec_samples = None, 0
                self.spec_switches += 1
            return alive

        alive = self._step_spec()
        take = getattr(self, "_last_take", None)
        if take is not None:
            self._spec_ewma = (take if self._spec_ewma is None
                               else 0.6 * self._spec_ewma + 0.4 * take)
            self._spec_samples += 1
            if (self._spec_samples >= self.spec_probe
                    and self._spec_ewma < self.spec_min_take):
                # speculation is not paying: hand the chains to the
                # chunked program (it resumes from self._prev for
                # slots past their prompt)
                for slot, req in self._active.items():
                    if self._slot_len.get(slot, 0) >= len(req.prompt):
                        self._prev[slot] = req.out[-1]
                self._spec_mode = False
                self._chunk_left = self.spec_reprobe
                self.spec_switches += 1
        return alive

    def _step_chunked(self) -> bool:
        self._admit()
        if self.reserve == "ondemand":
            self._ensure_pages()
        if not self._active:
            return bool(self._queue)

        forced, mask, advance, idle = self._chunk_inputs()
        (self._pool_k, self._pool_v, self._lens, self._keys,
         outs) = self._chunk_step(
            self._pool_k, self._pool_v, self._tables, self._lens,
            jnp.asarray(self._prev), self._keys, jnp.asarray(forced),
            jnp.asarray(mask), jnp.asarray(advance), jnp.asarray(idle))
        self.steps += 1
        self.micro_steps += self.chunk
        for slot in self._active:
            self._slot_len[slot] = self._slot_len.get(slot, 0) \
                + self.chunk
        self._account_outputs(outs)
        return bool(self._active or self._queue)
