"""Continuous batching for decoder-only generation serving.

Requests JOIN and LEAVE the decode batch mid-flight — the device always
steps a fixed [SLOTS]-wide batch (static shapes, one compiled step), while
the host scheduler admits waiting prompts into freed slots between steps.
Versus coalesce-then-generate batching (serving/server.py), a long
generation no longer blocks the batch: short requests drain early and their
slots are refilled immediately, which is the throughput/latency profile of
modern LLM servers (vLLM-style scheduling, re-derived for XLA's static
shapes — slot state lives in fixed [L, SLOTS, T, H, D] cache arrays, joins
are dynamic_update_slice at the slot index, per-slot write positions make
the KV update a scatter).

Capability beyond the reference: its serving story is the commented-out
elastic predictor spec (reference easynlp/core/predictor.py:232-490);
nothing streams requests through a shared decode loop.

Greedy, decoder-only (gpt2 family), token-id API. Exact: each request's
output equals standalone greedy decoding of its prompt (tests assert
token equality).
"""

import queue
import threading
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class _Pending:
    __slots__ = ("ids", "max_new_tokens", "event", "tokens", "slot",
                 "index0", "error")

    def __init__(self, ids, max_new_tokens):
        self.ids = ids
        self.max_new_tokens = max_new_tokens
        self.event = threading.Event()
        self.tokens: List[int] = []
        self.slot = -1
        self.index0 = 0
        self.error: Optional[BaseException] = None

    def result(self, timeout=None) -> List[int]:
        if not self.event.wait(timeout):
            raise TimeoutError("generation did not complete in time")
        if self.error is not None:
            raise RuntimeError("generation failed") from self.error
        return self.tokens


class ContinuousBatcher:
    """Slot-based continuous decode over a GPT2-family module.

    submit() returns a handle whose .result() blocks for the generated ids;
    a background thread steps the shared batch while slots are occupied.
    """

    def __init__(self, module, params, max_slots=4, max_length=128,
                 prompt_buckets=(16, 32, 64), eos_token_id=None,
                 pad_token_id=0):
        from easynlp_tpu.modelzoo.quantization import dequantize_params
        self.module = module
        self.params = params
        self.slots = max_slots
        self.max_length = max_length
        self.buckets = tuple(sorted(b for b in prompt_buckets
                                    if b < max_length))
        assert self.buckets, "need at least one prompt bucket < max_length"
        self.eos = eos_token_id
        self.pad = pad_token_id
        c = module.config
        l, h, d = c.n_layer, c.n_head, c.n_embd // c.n_head
        t = max_length
        self._state = {
            "k": jnp.zeros((l, max_slots, t, h, d), module.dtype),
            "v": jnp.zeros((l, max_slots, t, h, d), module.dtype),
            "mask": jnp.zeros((max_slots, t), jnp.int32),
            "index": jnp.zeros((max_slots,), jnp.int32),
            "last": jnp.full((max_slots,), pad_token_id, jnp.int32),
        }
        self._dq = dequantize_params

        def step(params, state, active):
            tokens = state["last"][:, None]
            positions = jnp.sum(state["mask"], -1, keepdims=True)
            bidx = jnp.arange(max_slots)
            mask = state["mask"].at[bidx, state["index"]].set(
                active.astype(jnp.int32))
            cache = {"k": state["k"], "v": state["v"], "mask": mask,
                     "index": state["index"]}
            out = self.module.apply(
                {"params": self._dq(params)}, input_ids=tokens,
                position_ids=positions, cache=cache, deterministic=True)
            logits = out["logits"][:, -1].astype(jnp.float32)
            nxt = jnp.where(active, jnp.argmax(logits, -1),
                            pad_token_id).astype(jnp.int32)
            new = {
                "k": out["cache"]["k"], "v": out["cache"]["v"], "mask": mask,
                "index": jnp.where(active, state["index"] + 1,
                                   state["index"]),
                "last": nxt,
            }
            return new, nxt

        self._step = jax.jit(step, donate_argnums=(1,))

        def insert(state, slot, k_new, v_new, mask_row, index0, last0):
            return {
                "k": jax.lax.dynamic_update_slice(
                    state["k"], k_new.astype(state["k"].dtype),
                    (0, slot, 0, 0, 0)),
                "v": jax.lax.dynamic_update_slice(
                    state["v"], v_new.astype(state["v"].dtype),
                    (0, slot, 0, 0, 0)),
                "mask": jax.lax.dynamic_update_slice(
                    state["mask"], mask_row[None], (slot, 0)),
                "index": jax.lax.dynamic_update_slice(
                    state["index"], index0[None], (slot,)),
                "last": jax.lax.dynamic_update_slice(
                    state["last"], last0[None], (slot,)),
            }

        self._insert = jax.jit(insert, donate_argnums=(0,))
        self._prefill_cache: Dict[int, Any] = {}

        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._occupants: List[Optional[_Pending]] = [None] * max_slots
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- host scheduling ------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens=32) -> _Pending:
        ids = list(int(x) for x in prompt_ids)
        # fail loudly rather than silently truncate: truncation would break
        # the token-exactness guarantee (output == standalone greedy decode)
        if len(ids) > self.buckets[-1]:
            raise ValueError(
                "prompt length %d exceeds the largest prompt bucket %d; "
                "construct the batcher with a larger prompt_buckets entry"
                % (len(ids), self.buckets[-1]))
        req = _Pending(ids, max_new_tokens)
        self._queue.put(req)
        self._wake.set()
        return req

    def __call__(self, prompt_ids, max_new_tokens=32):
        return self.submit(prompt_ids, max_new_tokens).result(timeout=600)

    def stop(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=30)
        self._fail_all(RuntimeError("batcher stopped"))

    def _fail_all(self, exc: BaseException):
        """Resolve every in-flight and queued request with an error so no
        caller blocks forever on a dead scheduler."""
        for slot, req in enumerate(self._occupants):
            if req is not None:
                self._occupants[slot] = None
                req.error = exc
                req.event.set()
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.error = exc
            req.event.set()

    def _bucket(self, n):
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _prefill_fn(self, p):
        fn = self._prefill_cache.get(p)
        if fn is None:
            def prefill(params, ids, mask):
                cache = self.module.init_cache(1, p, dtype=self.module.dtype)
                cache["mask"] = mask.astype(jnp.int32)
                out = self.module.apply(
                    {"params": self._dq(params)}, input_ids=ids,
                    attention_mask=mask, cache=cache, deterministic=True)
                logits = out["logits"][:, -1].astype(jnp.float32)
                first = jnp.argmax(logits, -1).astype(jnp.int32)
                return out["cache"]["k"], out["cache"]["v"], first
            fn = jax.jit(prefill)
            self._prefill_cache[p] = fn
        return fn

    def _admit(self, req: _Pending, slot: int):
        from easynlp_tpu.modelzoo.generation_utils import left_pad
        p = self._bucket(len(req.ids))
        row, mask = left_pad([req.ids], pad_token_id=self.pad, length=p)
        k1, v1, first = self._prefill_fn(p)(
            self.params, jnp.asarray(row), jnp.asarray(mask))
        first_tok = int(first[0])
        req.tokens.append(first_tok)
        # pad the slot row out to max_length before insertion
        t = self.max_length
        l = k1.shape[0]
        k_new = jnp.zeros((l, 1, t) + k1.shape[3:], k1.dtype)
        k_new = jax.lax.dynamic_update_slice(k_new, k1, (0, 0, 0, 0, 0))
        v_new = jnp.zeros_like(k_new)
        v_new = jax.lax.dynamic_update_slice(v_new, v1, (0, 0, 0, 0, 0))
        mask_row = np.zeros((t,), np.int32)
        mask_row[:p] = mask[0]
        self._state = self._insert(
            self._state, jnp.asarray(slot, jnp.int32), k_new, v_new,
            jnp.asarray(mask_row), jnp.asarray(p, jnp.int32),
            jnp.asarray(first_tok, jnp.int32))
        self._occupants[slot] = req
        req.slot = slot
        req.index0 = p
        if (self.eos is not None and first_tok == self.eos) \
                or req.max_new_tokens <= 1:
            self._finish(slot)

    def _finish(self, slot: int):
        req = self._occupants[slot]
        self._occupants[slot] = None
        if req is not None:
            req.event.set()

    def _run(self):
        # any error (compile failure, OOM) is fatal for the loop: _state may
        # hold donated/invalidated buffers, so recovery is impossible — fail
        # every pending request loudly instead of hanging their callers
        try:
            self._run_loop()
        except BaseException as exc:  # noqa: B902 — deliver to waiters
            self._fail_all(exc)

    def _run_loop(self):
        while not self._stop.is_set():
            # admit waiting requests into free slots
            while any(o is None for o in self._occupants):
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                self._admit(req, self._occupants.index(None))
            active_flags = [o is not None for o in self._occupants]
            if not any(active_flags):
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            self._state, toks = self._step(
                self.params, self._state, jnp.asarray(active_flags))
            toks = np.asarray(toks)
            for slot, req in enumerate(self._occupants):
                if req is None:
                    continue
                tok = int(toks[slot])
                req.tokens.append(tok)
                # host mirrors the slot write index: index0 + steps taken
                done = (self.eos is not None and tok == self.eos) \
                    or len(req.tokens) >= req.max_new_tokens \
                    or req.index0 + len(req.tokens) >= self.max_length - 1
                if done:
                    self._finish(slot)
