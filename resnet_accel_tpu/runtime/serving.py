"""Continuous-batching LM serving: slot-based batched greedy decoding.

Production LM serving rarely sees aligned request batches; the standard
engine shape (Orca-style continuous batching) keeps a fixed pool of
sequence slots stepping in lockstep — every device dispatch advances
ALL active slots by one token, requests join a free slot the moment one
drains, and prompt ingestion ("prefill") rides the same batched decode
step by force-feeding prompt tokens (their logits are ignored until the
prompt is consumed).

TPU-native angles:
- ONE jitted program for the whole engine step: vmapped
  ``TransformerLMInt8.decode_step`` over the stacked per-slot KV caches
  (static shapes: the pool size and cache length never change), with
  ``chunk`` micro-steps scanned inside the dispatch (iteration-level
  scheduling; measured 15x dispatch amortization on the tunneled v5e).
- Slot recycling is a tiny jitted cache reset (`len = 0`); stale K/V
  beyond ``len`` is never attended (decode_step masks by position), so
  no cache zeroing is needed.
- Greedy results are bit-identical to ``TransformerLMInt8.generate``
  per sequence (token-by-token prefill is the same computation), which
  is what the tests assert — including slot-reuse isolation.
- Sampling mode (``temperature``/``top_k`` + per-request ``seed``)
  carries one PRNG chain per slot, advanced exactly once per consumed
  token, so batched outputs equal per-sequence
  ``TransformerLMInt8.sample`` streams for any interleaving.
- ``eos`` stops a request early (token included), freeing its slot.

The reference has no serving stack at all (its runtime is a single
accelerator driver); this module is a beyond-parity capability on top
of the INT8 sparse LM (models/lm.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: List[int]
    n_new: int
    seed: int = 0                # per-request sampling stream
    eos: Optional[int] = None    # stop early on this token
    fed: int = 0                 # prompt tokens consumed so far
    out: List[int] = dataclasses.field(default_factory=list)
    # Preemption-by-recompute state (paged engine, reserve="ondemand"):
    # a preempted request folds its generated tokens into the prompt
    # (recompute on re-admission), accumulates them in ``emitted``, and
    # carries its PRNG chain in ``saved_key`` so the resumed sampling
    # stream continues exactly where it stopped.
    total_new: Optional[int] = None   # original n_new (n_new = remaining)
    emitted: List[int] = dataclasses.field(default_factory=list)
    saved_key: Optional[np.ndarray] = None

    @property
    def prefilling(self) -> bool:
        return self.fed < len(self.prompt)

    @property
    def done(self) -> bool:
        if self.prefilling:
            return False
        if len(self.out) >= self.n_new:
            return True
        return self.eos is not None and bool(self.out) \
            and self.out[-1] == self.eos


class _IterationScheduler:
    """Host-side iteration-level scheduler shared by the fixed-slot and
    paged engines (runtime/paged.py): chunk input construction, output
    accounting, queue drain.  Subclasses own slot admission (and, for
    the paged engine, page allocation) plus the jitted device step;
    everything request-shaped lives here so scheduling fixes land in
    ONE place.

    Subclass contract: attributes ``slots``, ``chunk``, ``max_len``,
    ``_queue``, ``_active``, ``_results``, ``_prev``, ``_next_rid``;
    optional hook ``_on_slot_free(slot)`` runs when a finished request
    leaves its slot."""

    def _validated_prompt(self, prompt: Sequence[int], n_new: int,
                          what: str) -> List[int]:
        prompt = [int(t) for t in np.asarray(prompt).reshape(-1)]
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) + n_new > self.max_len:
            raise ValueError(
                f"prompt ({len(prompt)}) + n_new ({n_new}) exceeds "
                f"{what} ({self.max_len})")
        return prompt

    def _enqueue(self, prompt: List[int], n_new: int, seed: int,
                 eos: Optional[int]) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(_Request(rid, prompt, n_new, seed=seed,
                                    eos=eos, total_new=n_new))
        return rid

    def _chunk_inputs(self):
        """(forced, mask, advance, idle) numpy arrays for one chunk."""
        k = self.chunk
        forced = np.zeros((k, self.slots), np.int32)
        mask = np.zeros((k, self.slots), bool)
        advance = np.zeros((k, self.slots), bool)
        for slot, req in self._active.items():
            rem = req.prompt[req.fed:req.fed + k]
            forced[:len(rem), slot] = rem
            mask[:len(rem), slot] = True
            # outputs are consumed from the last prompt step onward
            first = max(len(req.prompt) - 1 - req.fed, 0)
            advance[first:, slot] = True
        idle = np.array([s not in self._active
                         for s in range(self.slots)])
        return forced, mask, advance, idle

    def _account_outputs(self, outs) -> None:
        """Distribute chunk outputs to requests; retire finished ones."""
        outs = np.asarray(outs)                      # [k, B]
        self._prev = outs[-1].copy()
        for slot in list(self._active):
            req = self._active[slot]
            for i in range(self.chunk):
                if req.prefilling:
                    req.fed += 1
                    if not req.prefilling:
                        # last prompt token's logits start generation
                        req.out.append(int(outs[i, slot]))
                elif not req.done:
                    req.out.append(int(outs[i, slot]))
            if req.done:
                total = req.total_new if req.total_new is not None \
                    else req.n_new
                self._results[req.rid] = \
                    (req.emitted + req.out)[:total]
                del self._active[slot]
                self._on_slot_free(slot)

    def _on_slot_free(self, slot: int) -> None:
        pass

    def run(self, max_steps: int = 100_000) -> Dict[int, List[int]]:
        """Drain the queue; returns {request id: generated tokens} for
        every request completed since the last run(), then clears them
        (so a long-lived engine does not accumulate results without
        bound)."""
        for _ in range(max_steps):
            if not self.step_engine():
                break
        else:
            raise RuntimeError(f"engine did not drain in {max_steps} "
                               "steps")
        out, self._results = self._results, {}
        return out

    def results(self) -> Dict[int, List[int]]:
        """Snapshot of completed-but-uncollected requests (cleared by
        run())."""
        return dict(self._results)


class ContinuousBatcher(_IterationScheduler):
    """Fixed-pool continuous batching over an INT8 LM.

    Args:
        model: models.lm.TransformerLMInt8.
        scales: static activation scales (model.calibrate(...)).
        slots: sequence slots stepping per dispatch (the static batch).
        max_len: per-slot KV length (default model.max_len).
    """

    def __init__(self, model, scales, slots: int = 4,
                 max_len: Optional[int] = None, chunk: int = 1,
                 temperature: float = 0.0, top_k: Optional[int] = None):
        if slots < 1:
            raise ValueError("slots must be >= 1")
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        self.model = model
        self.scales = scales
        self.slots = slots
        self.chunk = chunk
        self.temperature = float(temperature)
        if top_k is not None and top_k < 1:
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        self.top_k = top_k
        self.max_len = model.max_len if max_len is None else max_len
        if self.max_len > model.max_len:
            # Positions past model.max_len would silently clamp into the
            # last position-embedding row (decode_step's dynamic slice),
            # corrupting outputs rather than erroring.
            raise ValueError(
                f"max_len {self.max_len} exceeds the model's position "
                f"table ({model.max_len})")

        per_slot = [model.init_caches(self.max_len)
                    for _ in range(slots)]
        self.caches = jax.tree.map(
            lambda *xs: jnp.stack(xs), *per_slot)

        greedy = self.temperature <= 0.0
        temp, top_k_ = self.temperature, self.top_k

        def one(c, t):
            logits, c2 = model.decode_step(c, t, scales)
            return c2, logits

        from resnet_accel_tpu.models.lm import sampled_token

        def pick(logits, key, adv):
            """Greedy everywhere, or (sampling mode) the SHARED draw of
            TransformerLMInt8.sample (models.lm.sampled_token) on
            advancing slots — one key split per consumed token, so the
            chain equals sample()'s exactly."""
            g = jnp.argmax(logits).astype(jnp.int32)
            if greedy:
                return g, key
            k2, s = sampled_token(logits, key, temp, top_k_)
            return (jnp.where(adv, s, g),
                    jnp.where(adv, k2, key))

        def chunk_step(caches, prev, keys, forced, mask, advance, idle):
            """Scan k lockstep micro-steps in ONE dispatch.

            ``prev`` [B]: each slot's previous output token;
            ``forced``/``mask`` [k, B]: prompt tokens still being
            ingested (masked slots take the forced token instead of
            their feedback) — so prefill and decode mix freely inside
            a chunk and the result is identical to k single steps.
            ``keys`` [B, 2]: per-slot PRNG chains; ``advance`` [k, B]
            marks micro-steps whose output is a consumed (sampled)
            token, so only those advance a slot's chain.
            ``idle`` [B]: slots with no live request — their cache
            position is re-zeroed after the chunk so an idle slot's
            ``len`` stays bounded by the chunk size instead of creeping
            past max_len (its discarded K/V writes land at 0..k-1 and
            are unreachable once a real request resets the slot).
            Returns (caches, keys, outs [k, B]).
            """
            def body(carry, fma):
                caches, prev, keys = carry
                f, m, a = fma
                toks = jnp.where(m, f, prev)
                caches, logits = jax.vmap(one)(caches, toks)
                nxt, keys = jax.vmap(pick)(logits, keys, a)
                return (caches, nxt, keys), nxt

            (caches, _, keys), outs = jax.lax.scan(
                body, (caches, prev, keys), (forced, mask, advance))
            caches = jax.tree.map(
                lambda leaf: (jnp.where(idle, 0, leaf)
                              if leaf.ndim == 1 else leaf),
                caches)
            return caches, keys, outs

        def reset_slot(caches, slot):
            # Only the position needs clearing: attention masks by
            # ``len``, so stale K/V rows are unreachable.
            return jax.tree.map(
                lambda leaf: (leaf.at[slot].set(0)
                              if leaf.ndim == 1 else leaf),
                caches)

        self._chunk_step = jax.jit(chunk_step)
        self._reset = jax.jit(reset_slot, static_argnums=1)

        self._queue: List[_Request] = []
        self._active: Dict[int, _Request] = {}      # slot -> request
        self._results: Dict[int, List[int]] = {}
        self._prev = np.zeros(slots, np.int32)      # last output/slot
        self._keys = jnp.zeros((slots, 2), jnp.uint32)
        self._next_rid = 0
        self.steps = 0                               # device dispatches
        self.micro_steps = 0                         # lockstep tokens

    # ------------------------------------------------------------- api
    def submit(self, prompt: Sequence[int], n_new: int,
               seed: int = 0, eos: Optional[int] = None) -> int:
        """Enqueue a request; returns its id (see results()).
        ``seed`` selects the request's sampling stream (matching
        ``model.sample(..., jax.random.PRNGKey(seed))``); unused in
        greedy mode.  ``eos``: generation stops early once this token
        is emitted (it is included in the result)."""
        prompt = self._validated_prompt(prompt, n_new,
                                        "slot cache length")
        return self._enqueue(prompt, n_new, seed, eos)

    def step_engine(self) -> bool:
        """One engine iteration (ONE device dispatch): admit waiting
        requests into free slots, then advance every slot ``chunk``
        lockstep tokens.  Returns False when there is nothing to do.

        Requests that finish mid-chunk simply feed their own feedback
        for the remaining micro-steps (the extra tokens are discarded
        and the slot's cache is reset on reuse) — iteration-level
        scheduling, the standard continuous-batching granularity
        trade-off.  ``chunk=1`` is exact per-token scheduling.
        """
        for slot in range(self.slots):
            if slot not in self._active and self._queue:
                self.caches = self._reset(self.caches, slot)
                self._active[slot] = self._queue.pop(0)
                self._prev[slot] = 0
                self._keys = self._keys.at[slot].set(
                    jax.random.PRNGKey(self._active[slot].seed))
        if not self._active:
            return False

        forced, mask, advance, idle = self._chunk_inputs()
        self.caches, self._keys, outs = self._chunk_step(
            self.caches, jnp.asarray(self._prev), self._keys,
            jnp.asarray(forced), jnp.asarray(mask),
            jnp.asarray(advance), jnp.asarray(idle))
        self.steps += 1
        self.micro_steps += self.chunk
        self._account_outputs(outs)
        return bool(self._active or self._queue)
