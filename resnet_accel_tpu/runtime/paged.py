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
    """

    def __init__(self, model, scales, slots: int = 4, page: int = 16,
                 pool_pages: int = 64, max_pages: Optional[int] = None,
                 chunk: int = 8, temperature: float = 0.0,
                 top_k: Optional[int] = None, reserve: str = "full",
                 prefix_cache: bool = False, kv_dtype: str = "fp32"):
        if slots < 1:
            raise ValueError("slots must be >= 1")
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        if page < 1:
            raise ValueError("page must be >= 1")
        if reserve not in ("full", "ondemand"):
            raise ValueError(
                f"reserve must be 'full' or 'ondemand', got {reserve!r}")
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

        L = len(model.blocks)
        D = model.blocks[0].d_model
        if kv_int8:
            # Quantized KV pages: int8 values + one fp32 scale per
            # (layer, page, position) — per-token symmetric rowwise
            # quantization at write time, dequantized AFTER the gather
            # (the HBM gather moves 4x fewer KV bytes and the pool
            # commits ~(D+4)/(4D) of the fp32 memory: ~3.9x smaller at
            # d_model 256).  Lossy by design (documented; quality
            # measured in tools/kv8_bench.py) — unlike everything else
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
        self._tables = jnp.zeros((self.slots, self.max_pages),
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
            """Scatter one token's K or V rows [B, D] into the pool."""
            if not kv_int8:
                return pool.at[li, pids, offs, :].set(val)
            s = jnp.maximum(jnp.max(jnp.abs(val), axis=-1),
                            1e-8) / 127.0                 # [B]
            q = jnp.clip(jnp.rint(val / s[:, None]),
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
        need = -(-(len(prompt) + n_new) // self.page)
        if need > self.pool_pages - 1:
            raise ValueError(
                f"request needs {need} KV pages but the pool only has "
                f"{self.pool_pages - 1} allocatable — it could never "
                "be admitted")
        return self._enqueue(prompt, n_new, seed, eos)

    def _pages_needed(self, req: _Request) -> int:
        return -(-(len(req.prompt) + req.n_new) // self.page)

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
            total = len(req.prompt) + req.n_new
            if self.reserve == "full":
                need = -(-total // self.page) - len(shared)
            else:
                need = (-(-min(total, fed0 + self.chunk) // self.page)
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
            row = np.zeros(self.max_pages, np.int32)
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
            total = len(req.prompt) + req.n_new
            target = min(total, self._slot_len[slot] + self.chunk)
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
            row = np.zeros(self.max_pages, np.int32)
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
            jnp.zeros(self.max_pages, jnp.int32))

    def step_engine(self) -> bool:
        """One engine iteration (ONE device dispatch).  Returns False
        when idle.  Scheduling is the shared _IterationScheduler; this
        adds page admission/growth/release (and, in ondemand mode,
        preemption) around it."""
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
