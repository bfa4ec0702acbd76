"""Prompt-lookup speculative decoding (greedy-exact, static shapes).

Serving-side decode accelerator beyond the reference's capability set
(reference generation is strictly one-token-per-forward,
easynlp/modelzoo/generation_utils.py:644): draft tokens are proposed by
matching the trailing n-gram of the generated buffer against earlier
occurrences (prompt lookup — no draft model needed), then ONE chunked
forward over [last_token, d_1..d_K] scores all drafts in parallel and the
longest prefix that agrees with the model's own greedy choices is accepted.
Output is token-exact vs plain greedy decoding; throughput gain comes from
committing up to K+1 tokens per forward on copy-heavy tasks (summarization,
dialogue, code).

TPU-first design notes:
- the verify forward is a fixed [B, K+1] chunk — batched matmuls on the MXU
  instead of K+1 bandwidth-bound single-token steps; weight streaming from
  HBM per committed token drops by the acceptance factor;
- everything runs in ONE `lax.while_loop`: the draft search is vectorized
  over the static [B, T] buffer (no host round-trips), acceptance is a
  traced scalar, cache rollback is an index/mask update;
- the accepted length is shared across the batch (min over rows) so the KV
  cache keeps ONE scalar write index and stays gap-free — per-row indices
  would turn every cache write into a scatter. Serving decode is small-batch,
  where the shared min costs little.

Model protocol (attached to the adapter's `decode` fn by
models/gpt2/generation.py and seq2seq_generation.py):
- decode.chunk(params, tokens[B,S], cache) -> (logits[B,S,V] fp32, cache)
  with the cache's write index advanced by S;
- decode.rollback(cache, drop) -> cache with the last `drop` of the
  just-written S entries invalidated (index -= drop, visibility re-masked).

Only position-static logits processors are supported under speculation
(min_length, bad_words_mask, eos, and the sampling warps temperature /
top-k / top-p); repetition_penalty / no_repeat_ngram depend on the
evolving sequence content per position and force a fallback to the plain
loop in `generate()`.

Sampling (`do_sample=True`) stays DISTRIBUTION-exact: position i of the
verify chunk is conditioned on the draft prefix d_1..d_i, so as long as
every earlier draft matched the token actually sampled, the chunk's
logits ARE the true ancestral conditionals — sample g_i from each, accept
while d_i == g_{i-1} (the standard speculative-sampling accept rule
specialized to a deterministic drafter). The realization differs from the
one-token-per-step sampler (different rng consumption order), but the
distribution is identical; top_k=1 collapses to greedy and is token-exact.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from easynlp_tpu.modelzoo.generation_utils import (NEG_INF, apply_temperature,
                                                   apply_top_k, apply_top_p)


def prompt_lookup_drafts(sequences, valid, cur_len, num_draft_tokens,
                         ngram_size, pad_token_id=0):
    """Propose [B, K] draft tokens: find the most recent earlier occurrence
    of the trailing `ngram_size`-gram and copy the tokens that followed it.

    Pure/jit-safe: O(B*T) comparisons over the static buffer. A row with no
    match drafts `pad_token_id` repeats — drafts never affect correctness
    (the verify pass rejects them), only the acceptance rate.
    """
    b, t = sequences.shape
    n = ngram_size
    k = num_draft_tokens
    # trailing n-gram = last n committed tokens [cur_len-n, cur_len)
    ngram = jax.lax.dynamic_slice(
        sequences, (0, jnp.maximum(cur_len - n, 0)), (b, n))      # [B, n]
    # windows[b, p, j] = sequences[b, p + j] for window starts p
    starts = jnp.arange(t - n + 1)
    win_idx = starts[:, None] + jnp.arange(n)[None, :]            # [P, n]
    windows = sequences[:, win_idx]                                # [B, P, n]
    win_valid = jnp.all(valid[:, win_idx] == 1, axis=-1)           # [B, P]
    eq = jnp.all(windows == ngram[:, None, :], axis=-1)            # [B, P]
    # a match must be strictly earlier than the trailing n-gram itself and
    # have at least one committed token after it to copy from. Among
    # matches, PREFER the most recent one whose K-token continuation is
    # fully committed: the naive most-recent match on repetitive text sits
    # right at the buffer end, so its continuation is mostly still-pad —
    # drafting pads that verification then rejects (measured: acceptance
    # collapsed to ~1/row/round on perfectly cyclic text).
    usable = (starts + n) <= (cur_len - 1)
    cand = eq & win_valid & usable[None, :]
    full = (starts + n + k) <= cur_len
    p_full = jnp.max(jnp.where(cand & full[None, :], starts, -1), axis=-1)
    p_any = jnp.max(jnp.where(cand, starts, -1), axis=-1)
    p_best = jnp.where(p_full >= 0, p_full, p_any)                 # [B]
    found = p_best >= 0
    src = jnp.clip(p_best + n, 0, t - 1)
    draft_idx = jnp.clip(src[:, None] + jnp.arange(k)[None, :], 0, t - 1)
    draft = jnp.take_along_axis(sequences, draft_idx, axis=1)      # [B, K]
    return jnp.where(found[:, None], draft,
                     jnp.full_like(draft, pad_token_id)).astype(jnp.int32)


def prompt_lookup_drafts_rowwise(sequences, valid, cur_len,
                                 num_draft_tokens, ngram_size,
                                 pad_token_id=0):
    """Per-ROW prompt lookup: like prompt_lookup_drafts but `cur_len` is a
    [B] array — the continuous-batching slot layout, where every slot's
    committed length differs (and rows may be left-padded, so the trailing
    n-gram is additionally required to sit on valid positions). Rows with
    no usable match draft `pad_token_id` repeats; drafts never affect
    correctness (verify rejects them), only acceptance."""
    b, t = sequences.shape
    n = ngram_size
    k = num_draft_tokens
    cur_len = cur_len.astype(jnp.int32)
    tail_idx = jnp.clip(cur_len[:, None] - n + jnp.arange(n)[None, :],
                        0, t - 1)                                  # [B, n]
    ngram = jnp.take_along_axis(sequences, tail_idx, axis=1)       # [B, n]
    tail_ok = jnp.all(
        jnp.take_along_axis(valid, tail_idx, axis=1) == 1, axis=-1) \
        & (cur_len >= n)                                           # [B]
    starts = jnp.arange(t - n + 1)
    win_idx = starts[:, None] + jnp.arange(n)[None, :]             # [P, n]
    windows = sequences[:, win_idx]                                 # [B, P, n]
    win_valid = jnp.all(valid[:, win_idx] == 1, axis=-1)            # [B, P]
    eq = jnp.all(windows == ngram[:, None, :], axis=-1)             # [B, P]
    usable = (starts[None, :] + n) <= (cur_len[:, None] - 1)        # [B, P]
    cand = eq & win_valid & usable
    # prefer the most recent match with a fully-committed K-token
    # continuation (see prompt_lookup_drafts: the naive most-recent match
    # drafts pads on cyclic text), falling back to any match
    full = (starts[None, :] + n + k) <= cur_len[:, None]            # [B, P]
    p_full = jnp.max(jnp.where(cand & full, starts[None, :], -1), axis=-1)
    p_any = jnp.max(jnp.where(cand, starts[None, :], -1), axis=-1)
    p_best = jnp.where(p_full >= 0, p_full, p_any)                  # [B]
    found = (p_best >= 0) & tail_ok
    src = jnp.clip(p_best + n, 0, t - 1)
    draft_idx = jnp.clip(src[:, None] + jnp.arange(k)[None, :], 0, t - 1)
    draft = jnp.take_along_axis(sequences, draft_idx, axis=1)       # [B, K]
    return jnp.where(found[:, None], draft,
                     jnp.full_like(draft, pad_token_id)).astype(jnp.int32)


class SpecState(NamedTuple):
    step: Any        # scalar: next write position (committed length)
    sequences: Any   # [B, Tb]
    valid: Any       # [B, Tb]
    cache: Any
    pending: Any     # [B] last committed token, not yet fed to the model
    finished: Any    # [B] bool
    rng: Any         # PRNG key (sampling)
    accepted: Any    # scalar: total accepted draft tokens (stats)
    rounds: Any      # scalar: verify forwards run (stats)


def _process_chunk_logits(logits, step, config):
    """Position-static processors on chunk logits [B, S, V]; position i of
    the chunk decodes buffer position step + i. `step` may be a scalar
    (batch-shared write position) or a [B] array (per-row positions)."""
    logits = logits.astype(jnp.float32)
    bad = config.get("bad_words_mask")
    if bad is not None:
        logits = jnp.where(bad if bad.ndim == 1 else bad[:, None, :],
                           NEG_INF, logits)
    min_length = config.get("min_length")
    eos = config.get("eos_token_id")
    if min_length and eos is not None:
        # [S] for scalar step, [B, S] for per-row step — either broadcasts
        # against [B, S, V] after the trailing vocab axis is added
        pos = jnp.expand_dims(jnp.asarray(step), -1) \
            + jnp.arange(logits.shape[1])
        ban = (pos < min_length)[..., None] & (
            jnp.arange(logits.shape[-1]) == eos)
        logits = jnp.where(ban, NEG_INF, logits)
    return logits


def speculative_greedy(prefill, decode_chunk, rollback, params, input_ids,
                       attention_mask, max_length, num_draft_tokens=8,
                       ngram_size=2, eos_token_id=None, pad_token_id=0,
                       do_sample=False, temperature=1.0, top_k=0, top_p=1.0,
                       rng=None, **proc_config):
    """Greedy (or ancestral-sampling) decoding with prompt-lookup
    speculation — see the module docstring for the sampling accept rule.

    input_ids LEFT-padded [B, P]. Returns (sequences [B, max_length],
    valid [B, max_length], stats dict of traced scalars). The adapter's
    cache must have >= max_length + num_draft_tokens + 1 slots (pass
    cache_slack to the adapter constructor).
    """
    for unsupported in ("repetition_penalty", "no_repeat_ngram_size"):
        if proc_config.get(unsupported):
            raise ValueError(
                f"{unsupported} is sequence-content-dependent per position "
                "and not supported under speculative decoding; use plain "
                "greedy (generate() falls back automatically)")
    b, p = input_ids.shape
    t = max_length
    k = num_draft_tokens
    tb = t + k + 1                       # buffer slack: a chunk written at
    assert t > p                         # step <= t-1 spans k+1 slots
    proc = dict(proc_config, eos_token_id=eos_token_id)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _choose(logits3, key):
        """[B, S, V] processed logits → [B, S] tokens."""
        if not do_sample:
            return jnp.argmax(logits3, axis=-1).astype(jnp.int32)
        warped = apply_temperature(logits3, temperature)
        warped = apply_top_k(warped, top_k)
        warped = apply_top_p(warped, top_p)
        return jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)

    sequences = jnp.full((b, tb), pad_token_id, jnp.int32)
    sequences = jax.lax.dynamic_update_slice(sequences, input_ids, (0, 0))
    valid = jnp.zeros((b, tb), jnp.int32)
    valid = jax.lax.dynamic_update_slice(valid, attention_mask, (0, 0))

    # prefill consumes the whole prompt; its logits commit the first
    # generated token, which becomes the pending (not-yet-fed) token
    logits0, cache = prefill(params, input_ids, attention_mask)
    rng, sub0 = jax.random.split(rng)
    g0 = _choose(
        _process_chunk_logits(logits0[:, None], jnp.asarray(p), proc),
        sub0)[:, 0]
    finished0 = (g0 == eos_token_id) if eos_token_id is not None \
        else jnp.zeros((b,), bool)
    sequences = jax.lax.dynamic_update_slice(sequences, g0[:, None], (0, p))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((b, 1), jnp.int32), (0, p))
    state = SpecState(jnp.asarray(p + 1), sequences, valid, cache,
                      jnp.where(finished0, pad_token_id, g0).astype(jnp.int32),
                      finished0, rng, jnp.zeros((), jnp.int32),
                      jnp.zeros((), jnp.int32))

    def cond(s):
        return (s.step < t) & ~jnp.all(s.finished)

    def body(s):
        draft = prompt_lookup_drafts(s.sequences, s.valid, s.step, k,
                                     ngram_size, pad_token_id)
        tokens_in = jnp.concatenate([s.pending[:, None], draft], axis=1)
        logits, cache = decode_chunk(params, tokens_in, s.cache)  # [B,K+1,V]
        new_rng, sub = jax.random.split(s.rng)
        g = _choose(_process_chunk_logits(logits, s.step, proc),
                    sub)                                           # [B,K+1]
        # d_i is accepted iff it equals the model's greedy choice g_{i-1}
        match = draft == g[:, :-1]                                 # [B, K]
        acc_row = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), 1)
        acc_row = jnp.where(s.finished, k, acc_row)  # dead rows don't bind
        a = jnp.min(acc_row)                         # shared accept (scalar)

        # committed tokens this round: g_0..g_a (g_0..g_{a-1} == d_1..d_a,
        # whose KV the verify pass already wrote; g_a is the free bonus token
        # and becomes the next pending)
        cidx = jnp.arange(k + 1)
        committed = cidx <= a                                       # [K+1]
        is_eos = (g == eos_token_id) & committed[None] \
            if eos_token_id is not None \
            else jnp.zeros_like(g, dtype=bool)
        eos_before = jnp.concatenate(
            [jnp.zeros((b, 1), bool),
             jnp.cumsum(is_eos.astype(jnp.int32), axis=1)[:, :-1] > 0], 1)
        dead = s.finished[:, None] | eos_before                     # [B,K+1]
        write_live = committed[None] & ~dead
        tok_write = jnp.where(write_live, g, pad_token_id).astype(jnp.int32)
        sequences = jax.lax.dynamic_update_slice(
            s.sequences, tok_write, (0, s.step))
        valid = jax.lax.dynamic_update_slice(
            s.valid, write_live.astype(jnp.int32), (0, s.step))
        finished = s.finished | jnp.any(is_eos & ~dead, axis=1)

        # of the K+1 cache entries just written ([pending, d_1..d_K]), keep
        # pending + the a accepted drafts; drop the rest
        cache = rollback(cache, k - a)
        bonus = jnp.take_along_axis(g, jnp.full((b, 1), a), axis=1)[:, 0]
        pending = jnp.where(finished, pad_token_id, bonus).astype(jnp.int32)
        return SpecState(s.step + 1 + a, sequences, valid, cache, pending,
                         finished, new_rng, s.accepted + a, s.rounds + 1)

    final = jax.lax.while_loop(cond, body, state)
    seqs = final.sequences[:, :t]
    val = final.valid[:, :t]
    # positions past a committed EOS (or past max_length inside the last
    # chunk) carry pad with valid=0 — normalize exactly like plain greedy
    seqs = jnp.where(val == 1, seqs, pad_token_id)
    stats = {"accepted_drafts": final.accepted, "verify_rounds": final.rounds,
             "generated": final.step - p}
    return seqs, val, stats


class RowSpecState(NamedTuple):
    step: Any        # [B] next buffer write position (committed length)
    sequences: Any   # [B, Tb]
    valid: Any       # [B, Tb]
    cache: Any       # per-row write index: cache["index"] is [B]
    pending: Any     # [B] last committed token, not yet fed to the model
    finished: Any    # [B] bool (EOS committed)
    accepted: Any    # scalar: total accepted draft tokens (stats)
    rounds: Any      # scalar: verify forwards run (stats)


def speculative_greedy_rowwise(prefill, decode_chunk_rowwise, params,
                               input_ids, attention_mask, max_length,
                               num_draft_tokens=8, ngram_size=2,
                               eos_token_id=None, pad_token_id=0,
                               **proc_config):
    """Greedy prompt-lookup speculation with PER-ROW acceptance.

    The batch-shared variant (`speculative_greedy`) commits
    1 + min-over-rows accepted drafts per verify round: one row with no
    usable n-gram match drags the whole batch to one token per round while
    still paying the chunk-forward cost — measured 0.866x plain greedy at
    B=8 on v5e (BENCH_r04 `speculative_decode_speedup`). Here every row
    advances by its own accepted length: the KV cache keeps a [B] write
    index, chunk entries land at per-row offsets (scatter write + per-row
    causal bias, the mechanism the continuous-batching decoder already
    uses — modeling_gpt2.py:67-98), and rejected drafts are dropped by
    re-masking instead of a rollback (the write index simply advances past
    the accepted prefix; stale entries stay invisible and are overwritten
    by later rounds). Token-exact vs plain greedy per row.

    `decode_chunk_rowwise(params, tokens [B,S], cache) -> (logits, cache)`
    must accept a cache whose "index" is a [B] array (the gpt2 adapter
    attaches it as `decode.chunk_rowwise`). Greedy-only: sampling keeps
    the batch-shared path (distribution-exactness is simplest to state
    there). Cache slack requirement is the same K+1 entries past
    max_length.
    """
    for unsupported in ("repetition_penalty", "no_repeat_ngram_size"):
        if proc_config.get(unsupported):
            raise ValueError(
                f"{unsupported} is sequence-content-dependent per position "
                "and not supported under speculative decoding; use plain "
                "greedy (generate() falls back automatically)")
    b, p = input_ids.shape
    t = max_length
    k = num_draft_tokens
    tb = t + k + 1
    assert t > p
    proc = dict(proc_config, eos_token_id=eos_token_id)
    bidx = jnp.arange(b)

    sequences = jnp.full((b, tb), pad_token_id, jnp.int32)
    sequences = jax.lax.dynamic_update_slice(sequences, input_ids, (0, 0))
    valid = jnp.zeros((b, tb), jnp.int32)
    valid = jax.lax.dynamic_update_slice(valid, attention_mask, (0, 0))

    logits0, cache = prefill(params, input_ids, attention_mask)
    g0 = jnp.argmax(
        _process_chunk_logits(logits0[:, None], jnp.asarray(p), proc),
        axis=-1).astype(jnp.int32)[:, 0]
    finished0 = (g0 == eos_token_id) if eos_token_id is not None \
        else jnp.zeros((b,), bool)
    sequences = jax.lax.dynamic_update_slice(sequences, g0[:, None], (0, p))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((b, 1), jnp.int32), (0, p))
    # vectorize the write index: every row's prefill ends at p
    cache = dict(cache, index=jnp.full((b,), cache["index"], jnp.int32))
    state = RowSpecState(
        jnp.full((b,), p + 1, jnp.int32), sequences, valid, cache,
        jnp.where(finished0, pad_token_id, g0).astype(jnp.int32),
        finished0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    def cond(s):
        return jnp.any(~s.finished & (s.step < t))

    def body(s):
        active = ~s.finished & (s.step < t)                        # [B]
        draft = prompt_lookup_drafts_rowwise(s.sequences, s.valid, s.step,
                                             k, ngram_size, pad_token_id)
        tokens_in = jnp.concatenate([s.pending[:, None], draft], axis=1)
        logits, cache_out = decode_chunk_rowwise(params, tokens_in, s.cache)
        g = jnp.argmax(_process_chunk_logits(logits, s.step, proc),
                       axis=-1).astype(jnp.int32)                  # [B,K+1]

        match = draft == g[:, :k]                                  # [B, K]
        acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), 1)
        n_new = jnp.minimum(acc + 1, t - s.step)          # per-row budget
        if eos_token_id is not None:
            is_eos = g == eos_token_id                             # [B,K+1]
            first_eos = jnp.argmax(is_eos, axis=1)
            has_eos = jnp.any(is_eos, axis=1)
            n_new = jnp.where(has_eos,
                              jnp.minimum(n_new, first_eos + 1), n_new)
        n_new = jnp.where(active, n_new, 0)

        cidx = jnp.arange(k + 1)
        commit = cidx[None, :] < n_new[:, None]                    # [B,K+1]
        pos_buf = s.step[:, None] + cidx[None, :]                  # [B,K+1]
        old_tok = jnp.take_along_axis(s.sequences, pos_buf, axis=1)
        old_val = jnp.take_along_axis(s.valid, pos_buf, axis=1)
        sequences = s.sequences.at[bidx[:, None], pos_buf].set(
            jnp.where(commit, g, old_tok))
        valid = s.valid.at[bidx[:, None], pos_buf].set(
            jnp.where(commit, 1, old_val))

        if eos_token_id is not None:
            finished = s.finished | jnp.any(is_eos & commit, axis=1)
        else:
            finished = s.finished

        # keep pending + accepted drafts visible, drop the rejected tail;
        # the write index advances by the accepted length only, so later
        # rounds overwrite the stale entries in place (gap-free per row)
        pos_cache = s.cache["index"][:, None] + cidx[None, :]
        cache = dict(cache_out)
        cache["index"] = s.cache["index"] + n_new
        cache["mask"] = cache_out["mask"].at[bidx[:, None], pos_cache].set(
            commit.astype(jnp.int32))

        bonus = jnp.take_along_axis(
            g, jnp.maximum(n_new - 1, 0)[:, None], axis=1)[:, 0]
        pending = jnp.where(active, bonus, s.pending)
        pending = jnp.where(finished, pad_token_id, pending)
        return RowSpecState(
            s.step + n_new, sequences, valid, cache, pending, finished,
            s.accepted + jnp.sum(jnp.maximum(n_new - 1, 0)), s.rounds + 1)

    final = jax.lax.while_loop(cond, body, state)
    seqs = final.sequences[:, :t]
    val = final.valid[:, :t]
    seqs = jnp.where(val == 1, seqs, pad_token_id)
    stats = {"accepted_drafts": final.accepted,
             "verify_rounds": final.rounds,
             "generated": jnp.sum(final.step - p)}
    return seqs, val, stats
