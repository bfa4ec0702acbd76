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

Decoder-only (gpt2 family), token-id API; greedy or per-request sampling
(temperature / top-k / top-p / seed — the PRNG stream is per-request:
token n draws from fold_in(PRNGKey(seed), n), so sampled outputs are a
pure function of (prompt, seed), independent of slot assignment, chunk
boundaries, co-tenants, and of which implementation runs the request).
Exact: each greedy request's output equals standalone greedy decoding of
its prompt, and each sampled request's output is identical between
ContinuousBatcher and DeviceContinuousDecoder (tests assert both).
"""

import queue
import threading
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# end-of-stream sentinel for _Pending.stream_q (distinct from any token id
# or exception instance)
_STREAM_END = object()


class _Pending:
    __slots__ = ("ids", "max_new_tokens", "event", "tokens", "slot",
                 "index0", "dispatched", "error", "do_sample", "temperature",
                 "top_k", "top_p", "seed", "stream_q", "cancelled",
                 "_close_lock")

    def __init__(self, ids, max_new_tokens, do_sample=False, temperature=1.0,
                 top_k=0, top_p=1.0, seed=0, stream=False):
        self.ids = ids
        self.max_new_tokens = max_new_tokens
        self.do_sample = bool(do_sample)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.seed = int(seed)
        self.event = threading.Event()
        self.tokens: List[int] = []
        self.slot = -1
        self.index0 = 0
        # decode steps ISSUED to the device (>= len(tokens) while results
        # are in flight): budget gating keys off this so the pipelined
        # scheduler never over-dispatches past max_new_tokens
        self.dispatched = 0
        self.error: Optional[BaseException] = None
        # streaming consumers read tokens as the scheduler commits them;
        # the queue carries token ids, then _STREAM_END (or the failure
        # exception) exactly once
        self.stream_q: Optional[queue.Queue] = queue.Queue() if stream \
            else None
        self.cancelled = False
        # close() is reachable from the scheduler thread (_finish/_fail_all)
        # AND caller threads (cancel-before-admit, post-enqueue _fail_all):
        # the lock makes first-close-wins atomic so exactly one terminal
        # stream item is enqueued and error/clean resolution agree
        self._close_lock = threading.Lock()

    def result(self, timeout=None) -> List[int]:
        if not self.event.wait(timeout):
            raise TimeoutError("generation did not complete in time")
        if self.error is not None:
            raise RuntimeError("generation failed") from self.error
        return self.tokens

    # ---- scheduler-side commit points (single scheduler thread) ----

    def push(self, tok: int):
        """Commit one generated token (scheduler thread only). Dropped once
        the request resolved: a cancel-before-admit race can close() first,
        and the caller's result() list must not mutate after it returned."""
        if self.event.is_set():
            return
        self.tokens.append(tok)
        if self.stream_q is not None:
            self.stream_q.put(tok)

    def close(self, error: Optional[BaseException] = None):
        """Resolve the request: wake result() waiters and terminate the
        token stream. Idempotent and thread-safe — the first close wins
        (atomically), so a request finished by the scheduler is not
        re-failed by a racing stop()/_fail_all, and exactly one terminal
        item reaches the stream."""
        with self._close_lock:
            if self.event.is_set():
                return
            if error is not None and self.error is None:
                self.error = error
            self.event.set()
            if self.stream_q is not None:
                self.stream_q.put(self.error if self.error is not None
                                  else _STREAM_END)

    # ---- consumer side ----

    def cancel(self):
        """Abandon the request: the scheduler retires its slot at the next
        loop iteration instead of decoding to budget, so a disconnected
        client stops costing device steps. No-op once resolved. The handle
        resolves normally with whatever tokens were committed.

        A request that is still QUEUED (never admitted) resolves here,
        immediately and empty — with every slot busy on long generations
        there may be no admission opportunity for a long time, and a
        cancelled caller must not block on result() until one. The admit
        path skips cancelled requests, and push()/close() tolerate the
        admit-vs-cancel race (tokens after resolution are dropped)."""
        self.cancelled = True
        if self.slot < 0:
            self.close()

    def iter_tokens(self, timeout=None):
        """Yield token ids as the batcher commits them (requires
        submit(..., stream=True)). `timeout` bounds the wait for EACH
        token; raises RuntimeError if generation failed mid-stream."""
        if self.stream_q is None:
            raise ValueError(
                "request was not submitted with stream=True")
        while True:
            try:
                item = self.stream_q.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    "no token produced within the stream timeout") from None
            if item is _STREAM_END:
                return
            if isinstance(item, BaseException):
                raise RuntimeError("generation failed") from item
            yield item


# placeholder for empty slots when gathering per-slot decode params: plain
# greedy, position 0 — its row is masked inactive so the values never matter
_GREEDY_DEFAULTS = _Pending([], 0)


def _prefill_prefix(module, params, prefix_ids, dq):
    """One-time KV prefill of a shared prompt prefix: returns
    (k, v) of shape [L, 1, P0, H, D] ready to broadcast across slots."""
    p0 = len(prefix_ids)
    pids = jnp.asarray([prefix_ids], jnp.int32)
    pmask = jnp.ones((1, p0), jnp.int32)

    def prefill(ps):
        cache = module.init_cache(1, p0, dtype=module.dtype)
        cache["mask"] = pmask
        out = module.apply({"params": dq(ps)}, input_ids=pids,
                           attention_mask=pmask, cache=cache,
                           deterministic=True)
        return out["cache"]["k"], out["cache"]["v"]

    return jax.jit(prefill)(params)


class ContinuousBatcher:
    """Slot-based continuous decode over a GPT2-family module.

    submit() returns a handle whose .result() blocks for the generated ids;
    a background thread steps the shared batch while slots are occupied.
    """

    def __init__(self, module, params, max_slots=4, max_length=128,
                 prompt_buckets=(16, 32, 64), eos_token_id=None,
                 pad_token_id=0, chunk_size=8, pipeline_depth=2,
                 shared_prefix=None):
        """shared_prefix: token ids of a batcher-wide shared prompt prefix
        (a system prompt). Its KV is prefilled ONCE here and reused by every
        request: submit() then takes only the per-request SUFFIX, admits
        prefill just the suffix at position offset len(prefix), and outputs
        are token-exact vs submitting prefix+suffix to a prefix-less batcher
        (asserted in tests). The prefix KV rows are written into each slot at
        admit time, so slot reuse needs no invalidation."""
        from easynlp_tpu.modelzoo.quantization import dequantize_for
        import functools
        self.module = module
        self.params = params
        self.slots = max_slots
        self.max_length = max_length
        # decode steps per device dispatch: each host round-trip through the
        # runtime costs ~ms, so stepping token-by-token is latency-bound —
        # a lax.scan of `chunk_size` greedy steps amortises the dispatch
        # (measured 26x tokens/s on the axon tunnel at chunk_size=16).
        # Joins/retirements happen at chunk boundaries; slots that hit
        # EOS / their token budget / the cache end DEactivate in-scan so
        # their cache rows stop advancing (trailing in-chunk tokens for a
        # finished slot are never consumed by the host).
        self.chunk = max(1, int(chunk_size))
        # dispatches allowed in flight before the oldest result is fetched:
        # depth >= 2 hides the full dispatch+sync round-trip behind device
        # compute (the device queue never drains while the host processes
        # results), at the cost of slot retirement/refill lagging by up to
        # depth-1 chunks. depth=1 = classic dispatch-then-sync.
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.prefix = [int(x) for x in (shared_prefix or [])]
        self._p0 = len(self.prefix)
        self.buckets = tuple(sorted(b for b in prompt_buckets
                                    if self._p0 + b < max_length))
        assert self.buckets, ("need at least one prompt bucket with "
                              "prefix_len + bucket < max_length")
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
        self._dq = functools.partial(dequantize_for, module)
        # shared-prefix KV, computed once: [L, 1, P0, H, D] — admits
        # broadcast it across slots, so no per-request prefix prefill
        self._prefix_kv = (_prefill_prefix(module, params, self.prefix,
                                           self._dq)
                           if self._p0 else None)

        eos = self.eos
        n_chunk = self.chunk

        def make_step(sampling):
            """`n_chunk` decode steps in ONE dispatch; returns the per-step
            tokens [n_chunk, SLOTS]. `remaining` is each slot's outstanding
            token budget so in-scan deactivation mirrors the host's
            retirement conditions (EOS / budget / cache end). The greedy
            variant keeps the sort-free argmax step; the sampling variant
            threads per-slot warp params + per-request PRNG streams
            (fold_in(seed, tokens_produced)) so mixed greedy/sampling
            occupants share one compiled step."""
            from easynlp_tpu.modelzoo.generation_utils import (
                rowwise_warp_and_sample)

            def step(params, state, active, remaining, seeds=None,
                     pos0=None, ds=None, temp=None, tk=None, tp=None):
                dparams = self._dq(params)
                bidx = jnp.arange(max_slots)
                cache_t = t  # cache time extent (== max_length)

                def body(carry, _):
                    state, active, remaining, pos = carry
                    tokens = state["last"][:, None]
                    positions = jnp.sum(state["mask"], -1, keepdims=True)
                    mask = state["mask"].at[bidx, state["index"]].set(
                        active.astype(jnp.int32))
                    cache = {"k": state["k"], "v": state["v"], "mask": mask,
                             "index": state["index"]}
                    out = self.module.apply(
                        {"params": dparams}, input_ids=tokens,
                        position_ids=positions, cache=cache,
                        deterministic=True)
                    logits = out["logits"][:, -1].astype(jnp.float32)
                    if sampling:
                        picked = rowwise_warp_and_sample(
                            logits, ds, temp, tk, tp, seeds, pos)
                    else:
                        picked = jnp.argmax(logits, -1)
                    nxt = jnp.where(active, picked,
                                    pad_token_id).astype(jnp.int32)
                    new_index = jnp.where(active, state["index"] + 1,
                                          state["index"])
                    new_remaining = remaining - active.astype(jnp.int32)
                    still = active & (new_remaining > 0) \
                        & (new_index < cache_t - 1)
                    if eos is not None:
                        still = still & (nxt != eos)
                    new = {
                        "k": out["cache"]["k"], "v": out["cache"]["v"],
                        "mask": mask, "index": new_index,
                        "last": jnp.where(active, nxt, state["last"]),
                    }
                    new_pos = pos + active.astype(jnp.int32)
                    return (new, still, new_remaining, new_pos), nxt

                pos = (jnp.zeros((max_slots,), jnp.int32)
                       if pos0 is None else pos0)
                (state, _, _, _), toks = jax.lax.scan(
                    body, (state, active, remaining, pos), None,
                    length=n_chunk)
                return state, toks

            if sampling:
                return jax.jit(step, donate_argnums=(1,))
            return jax.jit(lambda params, state, active, remaining:
                           step(params, state, active, remaining),
                           donate_argnums=(1,))

        self._step = make_step(sampling=False)
        self._make_step = make_step
        self._step_sample = None  # compiled lazily on first sampling request
        self._admit_cache: Dict[Any, Any] = {}

        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._occupants: List[Optional[_Pending]] = [None] * max_slots
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._dead: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- host scheduling ------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens=32, do_sample=False,
               temperature=1.0, top_k=0, top_p=1.0, seed=0,
               stream=False) -> _Pending:
        """Sampling is per-request: a request's sampled tokens are a pure
        function of (prompt, seed) — fold_in(PRNGKey(seed), n) draws token
        n — so they do not depend on slot assignment, chunk boundaries, or
        co-tenant requests, and equal the DeviceContinuousDecoder's output
        for the same request (asserted in tests).

        `stream=True` additionally exposes tokens incrementally through
        `handle.iter_tokens()` as the scheduler commits them; the streamed
        sequence is identical to `handle.result()` (which stays usable)."""
        ids = list(int(x) for x in prompt_ids)
        # fail loudly rather than silently truncate: truncation would break
        # the token-exactness guarantee (output == standalone greedy decode)
        if len(ids) > self.buckets[-1]:
            raise ValueError(
                "prompt length %d exceeds the largest prompt bucket %d; "
                "construct the batcher with a larger prompt_buckets entry"
                % (len(ids), self.buckets[-1]))
        req = _Pending(ids, max_new_tokens, do_sample=do_sample,
                       temperature=temperature, top_k=top_k, top_p=top_p,
                       seed=seed, stream=stream)
        if self._dead is not None:
            # scheduler already crashed: fail fast instead of letting the
            # caller block until its result() timeout
            req.close(self._dead)
            return req
        self._queue.put(req)
        # re-check AFTER enqueue: a crash between the check above and the
        # put() would otherwise strand this request past _fail_all's drain
        if self._dead is not None:
            self._fail_all(self._dead)
        self._wake.set()
        return req

    def __call__(self, prompt_ids, max_new_tokens=32):
        return self.submit(prompt_ids, max_new_tokens).result(timeout=600)

    def stop(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=30)
        stopped = RuntimeError("batcher stopped")
        # a stopped scheduler is dead to later submits too: without this a
        # post-stop submit would enqueue and block until its result timeout
        if self._dead is None:
            self._dead = stopped
        self._fail_all(stopped)

    def _fail_all(self, exc: BaseException):
        """Resolve every in-flight and queued request with an error so no
        caller blocks forever on a dead scheduler."""
        for slot, req in enumerate(self._occupants):
            if req is not None:
                self._occupants[slot] = None
                req.close(exc)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.close(exc)

    def _bucket(self, n):
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _admit_fn(self, p, sampling=False):
        """Batched prefill + slot insertion in ONE dispatch: up to SLOTS
        same-bucket prompts prefill as a [SLOTS, p] batch and their KV/mask/
        index/last rows scatter into the shared state, `valid` gating the
        padding rows (their `sidx` entries are the UNUSED slot numbers so the
        scatter has no duplicate indices — they write back the current
        values). Per-request prefill+insert dispatches were the dominant
        scheduler cost through the runtime's per-dispatch latency.
        The sampling variant draws the first token (PRNG position 0) from
        per-row warped logits instead of argmax."""
        fn = self._admit_cache.get((p, sampling))
        if fn is None:
            from easynlp_tpu.modelzoo.generation_utils import (
                rowwise_warp_and_sample)
            slots, t, p0 = self.slots, self.max_length, self._p0
            pb = p0 + p  # prefilled row extent: shared prefix + this bucket

            def admit(params, state, prefix_kv, ids, mask, sidx, valid,
                      seeds=None, ds=None, temp=None, tk=None, tp=None):
                cache = self.module.init_cache(slots, pb,
                                               dtype=self.module.dtype)
                smask = mask.astype(jnp.int32)
                positions = None
                if p0:
                    # suffix prefill over [prefix KV; suffix]: queries write
                    # at offset p0 and see the prefix through the cache mask;
                    # positions are absolute (prefix occupies 0..p0-1)
                    pk, pv = prefix_kv
                    cache["k"] = cache["k"].at[:, :, :p0].set(
                        pk.astype(cache["k"].dtype))
                    cache["v"] = cache["v"].at[:, :, :p0].set(
                        pv.astype(cache["v"].dtype))
                    cache["index"] = jnp.full((), p0, jnp.int32)
                    cache["mask"] = jnp.concatenate(
                        [jnp.ones((slots, p0), jnp.int32), smask], axis=1)
                    positions = p0 + jnp.maximum(
                        jnp.cumsum(smask, -1) - 1, 0)
                else:
                    cache["mask"] = smask
                out = self.module.apply(
                    {"params": self._dq(params)}, input_ids=ids,
                    attention_mask=mask, position_ids=positions,
                    cache=cache, deterministic=True)
                logits = out["logits"][:, -1].astype(jnp.float32)
                if sampling:
                    first = rowwise_warp_and_sample(
                        logits, ds, temp, tk, tp, seeds,
                        jnp.zeros((slots,), jnp.int32))
                else:
                    first = jnp.argmax(logits, -1).astype(jnp.int32)
                k1 = out["cache"]["k"].astype(state["k"].dtype)
                v1 = out["cache"]["v"].astype(state["v"].dtype)
                vk = valid[None, :, None, None, None]
                new_k = state["k"].at[:, sidx, :pb].set(
                    jnp.where(vk, k1, state["k"][:, sidx, :pb]))
                new_v = state["v"].at[:, sidx, :pb].set(
                    jnp.where(vk, v1, state["v"][:, sidx, :pb]))
                full_mask = jnp.zeros((slots, t), jnp.int32) \
                    .at[:, :pb].set(cache["mask"])
                new_mask = state["mask"].at[sidx].set(
                    jnp.where(valid[:, None], full_mask,
                              state["mask"][sidx]))
                new_index = state["index"].at[sidx].set(
                    jnp.where(valid, jnp.full((slots,), pb, jnp.int32),
                              state["index"][sidx]))
                new_last = state["last"].at[sidx].set(
                    jnp.where(valid, first, state["last"][sidx]))
                return ({"k": new_k, "v": new_v, "mask": new_mask,
                         "index": new_index, "last": new_last}, first)

            if sampling:
                fn = jax.jit(admit, donate_argnums=(1,))
            else:
                fn = jax.jit(
                    lambda params, state, prefix_kv, ids, mask, sidx, valid:
                    admit(params, state, prefix_kv, ids, mask, sidx, valid),
                    donate_argnums=(1,))
            self._admit_cache[(p, sampling)] = fn
        return fn

    def _admit_wave(self, wave):
        """Admit a list of (req, slot) pairs: one DISPATCH per prompt bucket
        represented in the wave, NO host sync — the first-token fetch rides
        the pipelined result stream (consumed in dispatch order with the
        chunk results), so an admit costs the scheduler nothing while the
        device is busy. Slot occupancy and budgets update here, at dispatch
        time. Returns the in-flight items to consume later."""
        from easynlp_tpu.modelzoo.generation_utils import left_pad
        by_bucket: Dict[int, list] = {}
        for req, slot in wave:
            by_bucket.setdefault(self._bucket(len(req.ids)), []).append(
                (req, slot))
        items = []
        for p, group in by_bucket.items():
            taken = [slot for _, slot in group]
            spare = [s for s in range(self.slots) if s not in taken]
            sidx = taken + spare[:self.slots - len(taken)]
            valid = [True] * len(taken) + [False] * (self.slots - len(taken))
            rows = [req.ids for req, _ in group]
            rows += [rows[0]] * (self.slots - len(rows))
            ids, mask = left_pad(rows, pad_token_id=self.pad, length=p)
            sampling = any(req.do_sample for req, _ in group)
            if sampling:
                reqs = [req for req, _ in group]
                reqs += [reqs[0]] * (self.slots - len(reqs))
                self._state, first = self._admit_fn(p, sampling=True)(
                    self.params, self._state, self._prefix_kv,
                    jnp.asarray(ids),
                    jnp.asarray(mask), jnp.asarray(sidx, jnp.int32),
                    jnp.asarray(valid),
                    jnp.asarray([r.seed for r in reqs], jnp.uint32),
                    jnp.asarray([r.do_sample for r in reqs]),
                    jnp.asarray([r.temperature for r in reqs], jnp.float32),
                    jnp.asarray([r.top_k for r in reqs], jnp.int32),
                    jnp.asarray([r.top_p for r in reqs], jnp.float32))
            else:
                self._state, first = self._admit_fn(p)(
                    self.params, self._state, self._prefix_kv,
                    jnp.asarray(ids),
                    jnp.asarray(mask), jnp.asarray(sidx, jnp.int32),
                    jnp.asarray(valid))
            for req, slot in group:
                self._occupants[slot] = req
                req.slot = slot
                req.index0 = self._p0 + p
                req.dispatched = 1  # the prefill's first token
            items.append(("admit", first, list(group)))
        return items

    def _consume_admit(self, first, group):
        first = np.asarray(first)  # one sync for the whole bucket group
        for i, (req, slot) in enumerate(group):
            if self._occupants[slot] is not req:
                continue
            first_tok = int(first[i])
            req.push(first_tok)
            if (self.eos is not None and first_tok == self.eos) \
                    or req.max_new_tokens <= 1:
                self._finish(slot)

    def _finish(self, slot: int):
        req = self._occupants[slot]
        self._occupants[slot] = None
        if req is not None:
            req.close()

    def _run(self):
        # any error (compile failure, OOM) is fatal for the loop: _state may
        # hold donated/invalidated buffers, so recovery is impossible — fail
        # every pending request loudly instead of hanging their callers
        try:
            self._run_loop()
        except BaseException as exc:  # noqa: B902 — deliver to waiters
            self._dead = exc
            self._fail_all(exc)

    def _consume(self, item):
        """Apply one in-flight result. Chunk tokens go to the requests
        occupying the slots AT DISPATCH TIME (`snapshot`); a slot
        retired-then-refilled since then fails the identity check and the
        stale rows are skipped — they are the deactivated scan's post-EOS
        garbage, never the new occupant's."""
        kind = item[0]
        if kind == "admit":
            self._consume_admit(item[1], item[2])
            return
        _, toks, snapshot = item
        toks = np.asarray(toks)  # [chunk, SLOTS] — the only per-chunk sync
        for k in range(toks.shape[0]):
            for slot in range(self.slots):
                req = snapshot[slot]
                if req is None or self._occupants[slot] is not req:
                    continue
                if len(req.tokens) >= req.max_new_tokens:
                    continue  # stale over-dispatch past an EOS'd budget
                tok = int(toks[k, slot])
                req.push(tok)
                # host mirrors the slot write index: index0 + steps taken
                done = (self.eos is not None and tok == self.eos) \
                    or len(req.tokens) >= req.max_new_tokens \
                    or req.index0 + len(req.tokens) >= self.max_length - 1
                if done:
                    self._finish(slot)

    def _run_loop(self):
        # Issue-ahead pipelining: up to `pipeline_depth` dispatches (admit
        # prefills AND decode chunks) stay in flight before the oldest
        # result is fetched, so every host round-trip hides behind device
        # compute — the device queue never drains while the host processes
        # results. Bookkeeping passed to a later dispatch is then up to
        # depth-1 chunks stale:
        # - budgets never over-run: gating keys off `dispatched` (steps
        #   ISSUED), which the host advances at dispatch time, and the
        #   in-scan `remaining` countdown mirrors it on-device;
        # - a slot whose EOS the host has not consumed yet IS re-stepped as
        #   active — its extra tokens are dropped by _consume's snapshot
        #   identity + budget checks, its cache rows are fully rewritten on
        #   the next admit, and the in-scan cache-end guard bounds the
        #   overrun. Consumed tokens stay exactly the standalone greedy
        #   sequence (staleness only ever OVER-produces).
        from collections import deque
        inflight: "deque" = deque()
        while not self._stop.is_set():
            # retire cancelled occupants first: their slot frees up this
            # iteration and the request resolves with the tokens already
            # committed (in-flight chunks for the slot are dropped by
            # _consume's snapshot identity check, same as EOS retirement)
            for slot, req in enumerate(self._occupants):
                if req is not None and req.cancelled:
                    self._finish(slot)
            # admit waiting requests into free slots (batched per bucket,
            # dispatch-only — first tokens join the result stream)
            wave = []
            for slot in range(self.slots):
                if self._occupants[slot] is not None:
                    continue
                req = None
                while req is None:
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if req.cancelled:
                        # cancelled before admission: resolve empty, never
                        # spend a prefill on it
                        req.close()
                        req = None
                if req is None:
                    break
                wave.append((req, slot))
            if wave:
                inflight.extend(self._admit_wave(wave))
            # dispatch one decode chunk over the slots with budget left
            active_flags = [
                req is not None and req.dispatched < req.max_new_tokens
                and req.index0 + req.dispatched < self.max_length - 1
                for req in self._occupants]
            if any(active_flags):
                remaining = np.asarray(
                    [(req.max_new_tokens - req.dispatched)
                     if is_a else 0
                     for req, is_a in zip(self._occupants, active_flags)],
                    np.int32)
                occ = [req if req is not None else _GREEDY_DEFAULTS
                       for req in self._occupants]
                if any(req.do_sample for req, is_a
                       in zip(occ, active_flags) if is_a):
                    if self._step_sample is None:
                        self._step_sample = self._make_step(sampling=True)
                    # PRNG position of each slot's next token = steps ISSUED
                    # for its request so far (prefill = position 0); the
                    # in-scan counter advances it per active step, so the
                    # consumed stream is fold_in(seed, 0..n-1) regardless of
                    # chunk boundaries or pipelined over-dispatch (dropped
                    # tokens burn positions the host never consumes — both
                    # sides key off steps issued, which match)
                    self._state, toks = self._step_sample(
                        self.params, self._state, jnp.asarray(active_flags),
                        jnp.asarray(remaining),
                        jnp.asarray([r.seed for r in occ], jnp.uint32),
                        jnp.asarray([r.dispatched for r in occ], jnp.int32),
                        jnp.asarray([r.do_sample for r in occ]),
                        jnp.asarray([r.temperature for r in occ],
                                    jnp.float32),
                        jnp.asarray([r.top_k for r in occ], jnp.int32),
                        jnp.asarray([r.top_p for r in occ], jnp.float32))
                else:
                    self._state, toks = self._step(
                        self.params, self._state, jnp.asarray(active_flags),
                        jnp.asarray(remaining))
                snapshot = [req if is_a else None for req, is_a
                            in zip(self._occupants, active_flags)]
                for req, is_a in zip(self._occupants, active_flags):
                    if is_a:
                        req.dispatched = min(req.dispatched + self.chunk,
                                             req.max_new_tokens)
                inflight.append(("chunk", toks, snapshot))
            elif not inflight:
                # nothing running, nothing pending: wait for a submit
                if not wave:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                continue
            # drain down to the pipeline depth; when every occupant has
            # exhausted its dispatch budget the loop above stops issuing,
            # so fully drain to learn the outcomes
            limit = self.pipeline_depth if any(active_flags) else 0
            while len(inflight) > limit:
                self._consume(inflight.popleft())


class DeviceContinuousDecoder:
    """Device-resident continuous batching for offline / batch generation.

    The ENTIRE mixed-length workload — slot admission (in-loop prefill),
    chunked greedy/sampled decode, EOS/budget retirement, and slot refill —
    runs inside one jitted ``lax.while_loop``: ONE device dispatch per call, so
    throughput is device-bound no matter how slow the host link is (the
    thread-based ContinuousBatcher pays a host round-trip per chunk; through
    a high-latency link that dominates). Same token-exactness guarantee:
    each request's output equals standalone greedy decoding of its prompt.

    Use this for batch/offline inference (the whole request set is known up
    front); use ContinuousBatcher for online streaming arrivals.
    """

    def __init__(self, module, params, max_slots=8, max_length=128,
                 prompt_bucket=32, eos_token_id=None, pad_token_id=0,
                 chunk_size=16, speculative=None, shared_prefix=None):
        """shared_prefix: token ids of a decoder-wide shared prompt prefix
        (a system prompt), prefilled ONCE at construction; calls then pass
        per-request SUFFIXES (each 1..prompt_bucket tokens) and outputs are
        token-exact vs a prefix-less decoder run on prefix+suffix. The
        speculative draft corpus includes the prefix, so prompt-lookup
        matches against the full context.

        speculative=(ngram_size, num_draft_tokens) enables prompt-lookup
        speculative decoding INSIDE the device loop for greedy requests:
        each round drafts K tokens by matching the slot's trailing n-gram
        against its own token history (kept in a device-resident [S, T]
        ids buffer), verifies them in ONE [S, K+1] forward (per-row chunk
        cache writes + causal bias), and commits the longest prefix that
        agrees with the model's own greedy choices — token-exact vs plain
        greedy, up to K+1 tokens per forward on copy-heavy text. Calls with
        any sampled request fall back to the non-speculative build. Slots
        retire when fewer than K+1 cache entries remain, so provision
        max_length >= prompt_bucket + max_new_tokens + K + 1."""
        from easynlp_tpu.modelzoo.quantization import dequantize_for
        import functools
        self.prefix = [int(x) for x in (shared_prefix or [])]
        self._p0 = len(self.prefix)
        assert self._p0 + prompt_bucket < max_length
        self.module = module
        self.params = params
        self.slots = int(max_slots)
        self.max_length = int(max_length)
        self.bucket = int(prompt_bucket)
        self.eos = eos_token_id
        self.pad = pad_token_id
        self.chunk = max(1, int(chunk_size))
        self.spec = None
        if speculative is not None:
            ngram, k = speculative
            assert k >= 1 and ngram >= 1
            assert self._p0 + self.bucket + k + 1 < self.max_length, \
                "speculative verify needs K+1 free cache entries past the " \
                "(shared prefix +) prompt bucket"
            self.spec = (int(ngram), int(k))
        self.last_spec_stats: Optional[Dict[str, int]] = None
        self._dq = functools.partial(dequantize_for, module)
        self._prefix_kv = (_prefill_prefix(module, params, self.prefix,
                                           self._dq)
                           if self._p0 else None)
        self._fn_cache: Dict[Any, Any] = {}

    def __call__(self, prompts, max_new_tokens, do_sample=False,
                 temperature=1.0, top_k=0, top_p=1.0, seed=0):
        """prompts: list of token-id lists (each <= prompt_bucket);
        max_new_tokens and the sampling params are an int/scalar or a
        per-request list. Returns a list of generated-token lists (EOS
        included, as in ContinuousBatcher). Request i's sampled stream is
        fold_in(PRNGKey(seed[i]), n) for token n — identical to the thread
        batcher's for the same request."""
        from easynlp_tpu.modelzoo.generation_utils import left_pad
        n = len(prompts)
        if n == 0:
            return []

        def per_req(x, cast):
            return ([cast(x)] * n if np.isscalar(x)
                    else [cast(v) for v in x])

        budgets = per_req(max_new_tokens, int)
        ds = per_req(do_sample, bool)
        temp = per_req(temperature, float)
        tk = per_req(top_k, int)
        tp = per_req(top_p, float)
        seeds = per_req(seed, int)
        for ids in prompts:
            if len(ids) > self.bucket:
                raise ValueError(
                    "prompt length %d exceeds prompt_bucket %d"
                    % (len(ids), self.bucket))
            if self._p0 and not len(ids):
                raise ValueError(
                    "with shared_prefix each request still needs >= 1 "
                    "suffix token (the admit forward reads its first-token "
                    "logits from the last suffix position)")
        spec = self.spec is not None and not any(ds)
        g = max(max(budgets), 1)
        # speculative verify writes K+1 cache entries per round, so a slot
        # must retire K entries before the window end
        g = min(g, self.max_length - 1 - (self.spec[1] if spec else 0))
        # pad N up to a multiple of SLOTS to bound distinct compile shapes
        n_pad = -(-n // self.slots) * self.slots
        rows = [list(p) for p in prompts] + [[self.pad]] * (n_pad - n)
        ids, mask = left_pad(rows, pad_token_id=self.pad, length=self.bucket)
        bud = np.zeros(n_pad + 1, np.int32)  # +1 = scatter-sink row
        bud[:n] = np.minimum(budgets, g)

        def padded(vals, dtype, fill):
            arr = np.full(n_pad + 1, fill, dtype)
            arr[:n] = vals
            return jnp.asarray(arr)

        ids = np.concatenate([np.asarray(ids, np.int32),
                              np.zeros((1, self.bucket), np.int32)])
        mask = np.concatenate([np.asarray(mask, np.int32),
                               np.zeros((1, self.bucket), np.int32)])
        sampling = any(ds)
        fn = self._get_fn(n_pad, g, sampling, spec)
        args = (self.params, self._prefix_kv, jnp.asarray(ids),
                jnp.asarray(mask), jnp.asarray(bud))
        if sampling:
            args += (padded(seeds, np.uint32, 0),
                     padded(ds, bool, False),
                     padded(temp, np.float32, 1.0),
                     padded(tk, np.int32, 0),
                     padded(tp, np.float32, 1.0))
        if spec:
            out, counts, rounds, committed = fn(*args)
            self.last_spec_stats = {
                "verify_rounds": int(rounds),
                "tokens_committed_in_rounds": int(committed),
            }
        else:
            out, counts = fn(*args)
            self.last_spec_stats = None
        out = np.asarray(out)
        counts = np.asarray(counts)
        return [out[i, :counts[i]].tolist() for i in range(n)]

    def _get_fn(self, n, g, sampling=False, spec=False):
        key = (n, g, sampling, spec)
        fn = self._fn_cache.get(key)
        if fn is None:
            build = self._build_spec if spec else self._build
            fn = jax.jit(build(n, g) if spec else build(n, g, sampling))
            self._fn_cache[key] = fn
        return fn

    def _build(self, n, g, sampling=False):
        from easynlp_tpu.modelzoo.generation_utils import (
            rowwise_warp_and_sample)
        module, s, t, p = self.module, self.slots, self.max_length, \
            self.bucket
        eos, pad, n_chunk = self.eos, self.pad, self.chunk
        p0, pb = self._p0, self._p0 + self.bucket
        sink = n  # scatter-sink row index in out/written

        def run(params, prefix_kv, ids, mask, budgets, seeds=None, ds=None,
                temp=None, tk=None, tp=None):
            dparams = self._dq(params)
            c = module.config
            heads, dim = c.n_head, c.n_embd // c.n_head
            bidx = jnp.arange(s)
            state = {
                "k": jnp.zeros((c.n_layer, s, t, heads, dim), module.dtype),
                "v": jnp.zeros((c.n_layer, s, t, heads, dim), module.dtype),
                "mask": jnp.zeros((s, t), jnp.int32),
                "index": jnp.zeros((s,), jnp.int32),
                "last": jnp.full((s,), pad, jnp.int32),
            }
            carry0 = {
                "state": state,
                "slot_req": jnp.full((s,), sink, jnp.int32),
                "active": jnp.zeros((s,), bool),
                "remaining": jnp.zeros((s,), jnp.int32),
                "produced": jnp.zeros((s,), jnp.int32),
                "next_req": jnp.int32(0),
                "out": jnp.full((n + 1, g), pad, jnp.int32),
                "written": jnp.zeros((n + 1,), jnp.int32),
            }

            def admit(carry):
                """Prefill the next waiting requests into the free slots:
                the in-loop equivalent of ContinuousBatcher._admit_fn."""
                state = carry["state"]
                free = ~carry["active"]
                order = jnp.cumsum(free.astype(jnp.int32)) - 1
                want = free & (carry["next_req"] + order < n)
                reqi = jnp.where(want, carry["next_req"] + order, sink)
                rows, rmask = ids[reqi], mask[reqi]
                cache0 = module.init_cache(s, pb, dtype=module.dtype)
                positions = None
                if p0:
                    pk, pv = prefix_kv
                    cache0["k"] = cache0["k"].at[:, :, :p0].set(
                        pk.astype(cache0["k"].dtype))
                    cache0["v"] = cache0["v"].at[:, :, :p0].set(
                        pv.astype(cache0["v"].dtype))
                    cache0["index"] = jnp.full((), p0, jnp.int32)
                    cache0["mask"] = jnp.concatenate(
                        [jnp.ones((s, p0), jnp.int32), rmask], axis=1)
                    positions = p0 + jnp.maximum(
                        jnp.cumsum(rmask, -1) - 1, 0)
                else:
                    cache0["mask"] = rmask
                outp = module.apply(
                    {"params": dparams}, input_ids=rows,
                    attention_mask=rmask, position_ids=positions,
                    cache=cache0, deterministic=True)
                logits0 = outp["logits"][:, -1].astype(jnp.float32)
                if sampling:
                    first = rowwise_warp_and_sample(
                        logits0, ds[reqi], temp[reqi], tk[reqi], tp[reqi],
                        seeds[reqi], jnp.zeros((s,), jnp.int32))
                else:
                    first = jnp.argmax(logits0, -1).astype(jnp.int32)
                wk = want[None, :, None, None, None]
                k1 = outp["cache"]["k"].astype(state["k"].dtype)
                v1 = outp["cache"]["v"].astype(state["v"].dtype)
                full_mask = jnp.zeros((s, t), jnp.int32) \
                    .at[:, :pb].set(cache0["mask"])
                new_state = {
                    "k": state["k"].at[:, :, :pb].set(
                        jnp.where(wk, k1, state["k"][:, :, :pb])),
                    "v": state["v"].at[:, :, :pb].set(
                        jnp.where(wk, v1, state["v"][:, :, :pb])),
                    "mask": jnp.where(want[:, None], full_mask,
                                      state["mask"]),
                    "index": jnp.where(want, pb, state["index"]),
                    "last": jnp.where(want, first, state["last"]),
                }
                budget = budgets[reqi]
                has_tok = want & (budget >= 1)
                out = carry["out"].at[
                    jnp.where(has_tok, reqi, sink), 0].set(
                    jnp.where(has_tok, first, pad))
                written = carry["written"].at[
                    jnp.where(want, reqi, sink)].set(
                    jnp.minimum(budget, 1))
                still = has_tok & (budget > 1) & (pb < t - 1)
                if eos is not None:
                    still = still & (first != eos)
                return {
                    "state": new_state,
                    "slot_req": jnp.where(want, reqi, carry["slot_req"]),
                    "active": jnp.where(want, still, carry["active"]),
                    "remaining": jnp.where(want, budget - 1,
                                           carry["remaining"]),
                    "produced": jnp.where(want, jnp.minimum(budget, 1),
                                          carry["produced"]),
                    "next_req": carry["next_req"]
                    + jnp.sum(want.astype(jnp.int32)),
                    "out": out,
                    "written": written,
                }

            def chunk(carry):
                """`n_chunk` decode steps (same math as
                ContinuousBatcher._step) + in-loop result scatter. Per-slot
                sampling params gather by the slot's request index; the PRNG
                position is the slot's produced counter, advancing per
                active step — so a request's sampled stream is
                fold_in(seed, 0..n-1) exactly like the thread batcher's."""
                if sampling:
                    sr = carry["slot_req"]
                    p_seed, p_ds = seeds[sr], ds[sr]
                    p_temp, p_tk, p_tp = temp[sr], tk[sr], tp[sr]

                def body(inner, _):
                    state, active, remaining, pos = inner
                    tokens = state["last"][:, None]
                    positions = jnp.sum(state["mask"], -1, keepdims=True)
                    mk = state["mask"].at[bidx, state["index"]].set(
                        active.astype(jnp.int32))
                    cache = {"k": state["k"], "v": state["v"], "mask": mk,
                             "index": state["index"]}
                    o = module.apply(
                        {"params": dparams}, input_ids=tokens,
                        position_ids=positions, cache=cache,
                        deterministic=True)
                    logits = o["logits"][:, -1].astype(jnp.float32)
                    if sampling:
                        picked = rowwise_warp_and_sample(
                            logits, p_ds, p_temp, p_tk, p_tp, p_seed, pos)
                    else:
                        picked = jnp.argmax(logits, -1)
                    nxt = jnp.where(active, picked, pad).astype(jnp.int32)
                    new_index = jnp.where(active, state["index"] + 1,
                                          state["index"])
                    new_remaining = remaining - active.astype(jnp.int32)
                    still = active & (new_remaining > 0) \
                        & (new_index < t - 1)
                    if eos is not None:
                        still = still & (nxt != eos)
                    new = {"k": o["cache"]["k"], "v": o["cache"]["v"],
                           "mask": mk, "index": new_index,
                           "last": jnp.where(active, nxt, state["last"])}
                    new_pos = pos + active.astype(jnp.int32)
                    return (new, still, new_remaining, new_pos), (nxt,
                                                                  active)

                (state, still, remaining, _), (toks, act) = jax.lax.scan(
                    body, (carry["state"], carry["active"],
                           carry["remaining"], carry["produced"]),
                    None, length=n_chunk)
                # scatter the chunk's tokens straight into out[req, pos]
                steps = jnp.cumsum(act.astype(jnp.int32), axis=0) - 1
                rows = jnp.where(act, carry["slot_req"][None, :], sink)
                cols = jnp.clip(carry["produced"][None, :] + steps, 0,
                                g - 1)
                out = carry["out"].at[rows, cols].set(
                    jnp.where(act, toks, pad))
                produced = carry["produced"] \
                    + jnp.sum(act.astype(jnp.int32), axis=0)
                written = carry["written"].at[carry["slot_req"]].set(
                    produced)
                return {
                    "state": state, "slot_req": carry["slot_req"],
                    "active": still, "remaining": remaining,
                    "produced": produced, "next_req": carry["next_req"],
                    "out": out, "written": written,
                }

            def cond(carry):
                return (carry["next_req"] < n) | jnp.any(carry["active"])

            def body(carry):
                can_admit = jnp.any(~carry["active"]) \
                    & (carry["next_req"] < n)
                carry = jax.lax.cond(can_admit, admit, lambda x: x, carry)
                carry = jax.lax.cond(jnp.any(carry["active"]), chunk,
                                     lambda x: x, carry)
                return carry

            final = jax.lax.while_loop(cond, body, carry0)
            return final["out"][:n], final["written"][:n]

        return run

    def _build_spec(self, n, g):
        """Speculative (greedy-only) variant of _build: each while-loop
        round drafts K tokens by per-row prompt lookup over the slot's own
        committed history, verifies [last, d_1..d_K] in ONE forward, and
        commits the longest draft prefix agreeing with the model's greedy
        choices (+1 bonus token). Token-exact vs the plain build: position
        i of the verify chunk is conditioned on exactly the committed
        prefix, so the greedy argmax stream is unchanged — acceptance only
        changes how many forwards the stream costs."""
        from easynlp_tpu.modelzoo.speculative import (
            prompt_lookup_drafts_rowwise)
        module, s, t, p = self.module, self.slots, self.max_length, \
            self.bucket
        eos, pad = self.eos, self.pad
        ngram, kd = self.spec
        p0, pb = self._p0, self._p0 + self.bucket
        prefix_row = (jnp.asarray(self.prefix, jnp.int32) if p0
                      else None)  # draft corpus includes the shared prefix
        sink = n

        def run(params, prefix_kv, ids, mask, budgets):
            dparams = self._dq(params)
            c = module.config
            heads, dim = c.n_head, c.n_embd // c.n_head
            bidx = jnp.arange(s)
            state = {
                "k": jnp.zeros((c.n_layer, s, t, heads, dim), module.dtype),
                "v": jnp.zeros((c.n_layer, s, t, heads, dim), module.dtype),
                "mask": jnp.zeros((s, t), jnp.int32),
                "index": jnp.zeros((s,), jnp.int32),
                "last": jnp.full((s,), pad, jnp.int32),
                # committed token at each cache position (the draft corpus);
                # the shared prefix sits at [:p0] for every slot, validity
                # still gated by the mask written at admit
                "ids": (jnp.full((s, t), pad, jnp.int32) if p0 == 0 else
                        jnp.full((s, t), pad, jnp.int32)
                        .at[:, :p0].set(prefix_row[None, :])),
            }
            carry0 = {
                "state": state,
                "slot_req": jnp.full((s,), sink, jnp.int32),
                "active": jnp.zeros((s,), bool),
                "remaining": jnp.zeros((s,), jnp.int32),
                "produced": jnp.zeros((s,), jnp.int32),
                "next_req": jnp.int32(0),
                "out": jnp.full((n + 1, g), pad, jnp.int32),
                "written": jnp.zeros((n + 1,), jnp.int32),
                "rounds": jnp.int32(0),
                "committed": jnp.int32(0),
            }

            def admit(carry):
                state = carry["state"]
                free = ~carry["active"]
                order = jnp.cumsum(free.astype(jnp.int32)) - 1
                want = free & (carry["next_req"] + order < n)
                reqi = jnp.where(want, carry["next_req"] + order, sink)
                rows, rmask = ids[reqi], mask[reqi]
                cache0 = module.init_cache(s, pb, dtype=module.dtype)
                positions = None
                if p0:
                    pk, pv = prefix_kv
                    cache0["k"] = cache0["k"].at[:, :, :p0].set(
                        pk.astype(cache0["k"].dtype))
                    cache0["v"] = cache0["v"].at[:, :, :p0].set(
                        pv.astype(cache0["v"].dtype))
                    cache0["index"] = jnp.full((), p0, jnp.int32)
                    cache0["mask"] = jnp.concatenate(
                        [jnp.ones((s, p0), jnp.int32), rmask], axis=1)
                    positions = p0 + jnp.maximum(
                        jnp.cumsum(rmask, -1) - 1, 0)
                else:
                    cache0["mask"] = rmask
                outp = module.apply(
                    {"params": dparams}, input_ids=rows,
                    attention_mask=rmask, position_ids=positions,
                    cache=cache0, deterministic=True)
                first = jnp.argmax(
                    outp["logits"][:, -1].astype(jnp.float32),
                    -1).astype(jnp.int32)
                wk = want[None, :, None, None, None]
                k1 = outp["cache"]["k"].astype(state["k"].dtype)
                v1 = outp["cache"]["v"].astype(state["v"].dtype)
                full_mask = jnp.zeros((s, t), jnp.int32) \
                    .at[:, :pb].set(cache0["mask"])
                new_state = {
                    "k": state["k"].at[:, :, :pb].set(
                        jnp.where(wk, k1, state["k"][:, :, :pb])),
                    "v": state["v"].at[:, :, :pb].set(
                        jnp.where(wk, v1, state["v"][:, :, :pb])),
                    "mask": jnp.where(want[:, None], full_mask,
                                      state["mask"]),
                    "index": jnp.where(want, pb, state["index"]),
                    "last": jnp.where(want, first, state["last"]),
                    "ids": state["ids"].at[:, p0:pb].set(
                        jnp.where(want[:, None], rows,
                                  state["ids"][:, p0:pb])),
                }
                budget = budgets[reqi]
                has_tok = want & (budget >= 1)
                out = carry["out"].at[
                    jnp.where(has_tok, reqi, sink), 0].set(
                    jnp.where(has_tok, first, pad))
                written = carry["written"].at[
                    jnp.where(want, reqi, sink)].set(
                    jnp.minimum(budget, 1))
                still = has_tok & (budget > 1) & (pb + kd + 1 <= t)
                if eos is not None:
                    still = still & (first != eos)
                return dict(
                    carry,
                    state=new_state,
                    slot_req=jnp.where(want, reqi, carry["slot_req"]),
                    active=jnp.where(want, still, carry["active"]),
                    remaining=jnp.where(want, budget - 1,
                                        carry["remaining"]),
                    produced=jnp.where(want, jnp.minimum(budget, 1),
                                       carry["produced"]),
                    next_req=carry["next_req"]
                    + jnp.sum(want.astype(jnp.int32)),
                    out=out, written=written)

            def spec_round(carry):
                state = carry["state"]
                active = carry["active"]
                remaining = carry["remaining"]
                index, last = state["index"], state["last"]

                # draft corpus = committed ids + the pending `last` token
                seq_m = state["ids"].at[bidx, index].set(last)
                val_m = state["mask"].at[bidx, index].set(1)
                drafts = prompt_lookup_drafts_rowwise(
                    seq_m, val_m, index + 1, kd, ngram, pad)       # [S, K]
                chunk_toks = jnp.concatenate([last[:, None], drafts],
                                             axis=1)              # [S, K+1]
                positions = (jnp.sum(state["mask"], -1)[:, None]
                             + jnp.arange(kd + 1)[None, :])
                pos = index[:, None] + jnp.arange(kd + 1)[None, :]
                mk = state["mask"].at[bidx[:, None], pos].set(
                    active[:, None].astype(jnp.int32))
                cache = {"k": state["k"], "v": state["v"], "mask": mk,
                         "index": index}
                o = module.apply(
                    {"params": dparams}, input_ids=chunk_toks,
                    position_ids=positions, cache=cache,
                    deterministic=True)
                gt = jnp.argmax(o["logits"].astype(jnp.float32),
                                -1).astype(jnp.int32)              # [S, K+1]

                # longest draft prefix agreeing with the greedy stream
                match = drafts == gt[:, :kd]                       # [S, K]
                acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32),
                                          axis=1), axis=1)         # [S]
                n_new = jnp.minimum(acc + 1, remaining)
                if eos is not None:
                    # stop at the first committed EOS, inclusive
                    is_eos = gt == eos                             # [S, K+1]
                    first_eos = jnp.argmax(is_eos, axis=1)
                    has_eos_any = jnp.any(is_eos, axis=1)
                    n_new = jnp.where(
                        has_eos_any & (first_eos + 1 <= n_new),
                        first_eos + 1, n_new)
                n_new = jnp.where(active, n_new, 0)

                commit = (jnp.arange(kd + 1)[None, :]
                          < n_new[:, None])                        # [S, K+1]
                old_ids = jnp.take_along_axis(state["ids"], pos, axis=1)
                new_state = {
                    "k": o["cache"]["k"], "v": o["cache"]["v"],
                    "mask": state["mask"].at[bidx[:, None], pos].set(
                        commit.astype(jnp.int32)),
                    "index": index + n_new,
                    "ids": state["ids"].at[bidx[:, None], pos].set(
                        jnp.where(commit, chunk_toks, old_ids)),
                    "last": jnp.where(
                        active,
                        jnp.take_along_axis(
                            gt, jnp.maximum(n_new - 1, 0)[:, None],
                            axis=1)[:, 0],
                        last),
                }
                new_remaining = remaining - n_new
                still = active & (new_remaining > 0) \
                    & (index + n_new + kd + 1 <= t)
                if eos is not None:
                    last_tok = new_state["last"]
                    still = still & (last_tok != eos)

                rows = jnp.where(commit, carry["slot_req"][:, None], sink)
                cols = jnp.clip(carry["produced"][:, None]
                                + jnp.arange(kd + 1)[None, :], 0, g - 1)
                out = carry["out"].at[rows, cols].set(
                    jnp.where(commit, gt, pad))
                produced = carry["produced"] + n_new
                written = carry["written"].at[carry["slot_req"]].set(
                    produced)
                return dict(
                    carry,
                    state=new_state, active=still,
                    remaining=new_remaining, produced=produced,
                    out=out, written=written,
                    rounds=carry["rounds"]
                    + jnp.any(active).astype(jnp.int32),
                    committed=carry["committed"] + jnp.sum(n_new))

            def cond(carry):
                return (carry["next_req"] < n) | jnp.any(carry["active"])

            def body(carry):
                can_admit = jnp.any(~carry["active"]) \
                    & (carry["next_req"] < n)
                carry = jax.lax.cond(can_admit, admit, lambda x: x, carry)
                carry = jax.lax.cond(jnp.any(carry["active"]), spec_round,
                                     lambda x: x, carry)
                return carry

            final = jax.lax.while_loop(cond, body, carry0)
            return (final["out"][:n], final["written"][:n],
                    final["rounds"], final["committed"])

        return run
