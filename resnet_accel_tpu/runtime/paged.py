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
                 top_k: Optional[int] = None, reserve: str = "full"):
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

        L = len(model.blocks)
        D = model.blocks[0].d_model
        self._pool_k = jnp.zeros((L, self.pool_pages, self.page, D),
                                 jnp.float32)
        self._pool_v = jnp.zeros_like(self._pool_k)
        self._tables = jnp.zeros((self.slots, self.max_pages),
                                 jnp.int32)          # 0 = dummy page
        self._lens = jnp.zeros(self.slots, jnp.int32)
        self._free: List[int] = list(range(1, self.pool_pages))
        self._slot_pages: Dict[int, List[int]] = {}
        self._slot_len: Dict[int, int] = {}   # host mirror of device lens
        self.preemptions = 0                  # recompute evictions

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
                pool_k = pool_k.at[li, pids, offs, :].set(k[:, 0, :])
                pool_v = pool_v.at[li, pids, offs, :].set(v[:, 0, :])
                # gather each slot's page view [B, maxP*page, D]
                k_view = pool_k[li][tables].reshape(
                    tables.shape[0], -1, k.shape[-1])
                v_view = pool_v[li][tables].reshape(
                    tables.shape[0], -1, v.shape[-1])
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

    def _initial_need(self, req: _Request) -> int:
        """Pages the first dispatch touches (ondemand admission)."""
        return -(-min(len(req.prompt) + req.n_new, self.chunk)
                 // self.page)

    def free_pages(self) -> int:
        return len(self._free)

    def _admit(self) -> None:
        for slot in range(self.slots):
            if slot in self._active or not self._queue:
                continue
            req = self._queue[0]
            need = (self._pages_needed(req) if self.reserve == "full"
                    else self._initial_need(req))
            if need > len(self._free):
                break                     # FIFO: wait for pages
            self._queue.pop(0)
            pages = [self._free.pop() for _ in range(need)]
            self._slot_pages[slot] = pages
            self._slot_len[slot] = 0
            row = np.zeros(self.max_pages, np.int32)
            row[:need] = pages
            self._tables = self._tables.at[slot].set(jnp.asarray(row))
            self._lens = self._lens.at[slot].set(0)
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
            while grow > len(self._free):
                victims = [s for s in self._active
                           if self._active[s].rid > req.rid]
                if not victims:
                    self._preempt(slot)   # park self; retry later
                    break
                self._preempt(max(
                    victims, key=lambda s: self._active[s].rid))
            if slot not in self._active or grow <= 0:
                continue
            self._slot_pages[slot].extend(
                self._free.pop() for _ in range(grow))
            row = np.zeros(self.max_pages, np.int32)
            pages = self._slot_pages[slot]
            row[:len(pages)] = pages
            self._tables = self._tables.at[slot].set(jnp.asarray(row))

    def _on_slot_free(self, slot: int) -> None:
        """Scheduler hook: return a finished request's pages."""
        self._free.extend(self._slot_pages.pop(slot, []))
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
