"""Text generation under jit.

Capability parity: reference easynlp/modelzoo/generation_utils.py
(GenerationMixin.generate :644 → greedy/sample/beam/beam-sample) and
generation_logits_process.py (temperature, top-k/p, repetition penalty,
min-length, no-repeat-ngram) — re-derived for XLA (SURVEY.md §7.3 "beam
search under jit"):

- everything runs in ONE `lax.while_loop` over a fixed [B, T] token buffer —
  no dynamic shapes, no host round-trips, one compile per (B, T, K);
- the KV cache is functional state threaded through the loop;
- processors are pure (logits, sequences, cur_len) → logits functions —
  the dynamic-list bans of the reference (per-sample bad-words) become
  static vocab masks;
- beam search is the standard flattened [B·K] formulation with live/finished
  lanes and length-penalty bookkeeping (t5x-style), not the reference's
  dynamic-length BeamSearchScorer.

Model protocol: `prefill(params, input_ids, attention_mask, cache)` and
`decode(params, token[B,1], cache)` both → (logits[B,V] for the last
position, cache). Decoder-only prompts are LEFT-padded (helper below).
"""

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e7


def left_pad(sequences, pad_token_id, length=None):
    """List of id-lists → left-padded [B, P] int32 + attention mask."""
    length = length or max(len(s) for s in sequences)
    ids = np.full((len(sequences), length), pad_token_id, np.int32)
    mask = np.zeros((len(sequences), length), np.int32)
    for i, seq in enumerate(sequences):
        seq = seq[-length:]
        ids[i, length - len(seq):] = seq
        mask[i, length - len(seq):] = 1
    return ids, mask


# -----------------------------------------------------------------------------
# logits processors (pure)
# -----------------------------------------------------------------------------

def apply_temperature(logits, temperature):
    if temperature and temperature != 1.0:
        return logits / jnp.float32(temperature)
    return logits


def apply_top_k(logits, top_k):
    if not top_k or top_k <= 0:
        return logits
    top_k = min(top_k, logits.shape[-1])
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits, top_p):
    if not top_p or top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep smallest set with cumulative prob >= top_p (always keeps top-1);
    # threshold = smallest kept logit
    drop_mask = cum - probs >= top_p
    cutoff = jnp.where(drop_mask, jnp.inf, sorted_logits).min(
        axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def rowwise_warp_and_sample(logits, do_sample, temperature, top_k, top_p,
                            seeds, positions):
    """Per-ROW sampling with per-row warp parameters and per-row PRNG
    streams — the serving-path counterpart of apply_temperature/top_k/top_p
    (same warp order and keep-set semantics, but every parameter is a traced
    [B] array so heterogeneous requests share ONE compiled step).

    The PRNG stream is per-request, not per-batch: row i's key is
    ``fold_in(PRNGKey(seeds[i]), positions[i])`` where ``positions[i]`` is
    how many tokens request i has produced so far. A request's sampled
    tokens are therefore a pure function of (prompt, seed) — independent of
    slot assignment, chunk boundaries, co-tenant requests, and of WHICH
    continuous-batching implementation runs it (thread batcher vs
    device-resident decoder); tests assert that cross-implementation
    equality. Rows with ``do_sample[i] == False`` return plain argmax.

    logits [B, V] float32; do_sample [B] bool; temperature/top_p [B] f32;
    top_k [B] i32 (<=0 = disabled); seeds [B] uint32; positions [B] i32.
    """
    v = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature.astype(jnp.float32), 1e-6)
    scaled = logits.astype(jnp.float32) / temp[:, None]
    # one descending sort serves both warps: top-k masks ranks >= k, and
    # top-p's cumulative softmax runs over the top-k-masked sorted values
    # (matching the temperature -> top_k -> top_p order of the engine)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    k_eff = jnp.where(top_k <= 0, v, jnp.clip(top_k, 1, v)).astype(jnp.int32)
    ranks = jnp.arange(v)[None, :]
    sorted_k = jnp.where(ranks < k_eff[:, None], sorted_desc, NEG_INF)
    kth = jnp.take_along_axis(sorted_desc, k_eff[:, None] - 1, axis=-1)
    warped = jnp.where(scaled < kth, NEG_INF, scaled)

    probs = jax.nn.softmax(sorted_k, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest set with cumulative prob >= top_p (top-1 always
    # kept); top_p >= 1 keeps everything because cum - probs < 1 by
    # construction
    drop = cum - probs >= top_p.astype(jnp.float32)[:, None]
    cutoff = jnp.where(drop, jnp.inf, sorted_k).min(axis=-1, keepdims=True)
    warped = jnp.where(scaled < cutoff, NEG_INF, warped)

    def _sample_row(seed, pos, row):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), pos)
        return jax.random.categorical(key, row)

    sampled = jax.vmap(_sample_row)(seeds.astype(jnp.uint32),
                                    positions.astype(jnp.int32),
                                    warped).astype(jnp.int32)
    return jnp.where(do_sample, sampled, greedy)


def apply_repetition_penalty(logits, sequences, valid_mask, penalty):
    """Reference semantics: divide positive logits of seen tokens by penalty,
    multiply negative ones."""
    if not penalty or penalty == 1.0:
        return logits
    v = logits.shape[-1]
    one_hot = jax.nn.one_hot(sequences, v, dtype=jnp.bool_)
    seen = jnp.any(one_hot & valid_mask[..., None].astype(bool), axis=-2)
    penalised = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalised, logits)


def apply_min_length(logits, cur_len, min_length, eos_token_id):
    if not min_length or eos_token_id is None:
        return logits
    ban = cur_len < min_length
    return jnp.where(
        ban & (jnp.arange(logits.shape[-1]) == eos_token_id)[None, :],
        NEG_INF, logits)


def apply_no_repeat_ngram(logits, sequences, cur_len, ngram_size):
    """Ban tokens completing an n-gram already present (static shapes:
    compare the trailing n-1 tokens against every window)."""
    if not ngram_size or ngram_size <= 0:
        return logits
    n = ngram_size
    b, t = sequences.shape
    if t < n:
        return logits

    idx = jnp.arange(t - n + 1)
    # windows[b, i, :] = sequences[b, i:i+n]
    windows = jax.vmap(
        lambda s: jax.vmap(
            lambda i: jax.lax.dynamic_slice(s, (i,), (n,)))(idx))(sequences)
    prefix = jax.lax.dynamic_slice(
        sequences, (0, jnp.maximum(cur_len - (n - 1), 0)), (b, n - 1))
    match = jnp.all(windows[:, :, :n - 1] == prefix[:, None, :], axis=-1)
    # windows fully inside generated region
    inside = (idx[None, :] + n) <= cur_len
    banned_tokens = windows[:, :, n - 1]
    ban_mask = jnp.zeros(logits.shape, bool)
    upd = (match & inside)[..., None] & (
        banned_tokens[..., None] == jnp.arange(logits.shape[-1])[None, None, :])
    ban_mask = jnp.any(upd, axis=1)
    return jnp.where(ban_mask, NEG_INF, logits)


def apply_bad_words_mask(logits, bad_words_mask):
    """bad_words_mask: bool [V] or [B, V]; True = banned. The reference's
    per-sample copy-restricted vocab (sequence_generation/model.py:195-212)
    compiles to exactly this mask."""
    if bad_words_mask is None:
        return logits
    return jnp.where(bad_words_mask, NEG_INF, logits)


def process_logits(logits, sequences, valid_mask, cur_len, config):
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(
        logits, sequences, valid_mask, config.get("repetition_penalty"))
    logits = apply_no_repeat_ngram(
        logits, sequences, cur_len, config.get("no_repeat_ngram_size"))
    logits = apply_min_length(
        logits, cur_len, config.get("min_length"), config.get("eos_token_id"))
    logits = apply_bad_words_mask(logits, config.get("bad_words_mask"))
    return logits


# -----------------------------------------------------------------------------
# greedy / sampling loop
# -----------------------------------------------------------------------------

class SampleState(NamedTuple):
    step: Any
    sequences: Any      # [B, T]
    valid: Any          # [B, T] 1 where real token
    cache: Any
    logits: Any         # [B, V] for next position
    finished: Any       # [B]
    rng: Any


def greedy_or_sample(prefill, decode, params, input_ids, attention_mask,
                     max_length, do_sample=False, temperature=1.0, top_k=0,
                     top_p=1.0, eos_token_id=None, pad_token_id=0, rng=None,
                     **proc_config):
    """input_ids LEFT-padded [B, P]; returns sequences [B, max_length]."""
    b, p = input_ids.shape
    t = max_length
    assert t > p, "max_length must exceed prompt length"
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    proc = dict(proc_config, eos_token_id=eos_token_id)

    sequences = jnp.full((b, t), pad_token_id, jnp.int32)
    sequences = jax.lax.dynamic_update_slice(sequences, input_ids, (0, 0))
    valid = jnp.zeros((b, t), jnp.int32)
    valid = jax.lax.dynamic_update_slice(valid, attention_mask, (0, 0))

    logits, cache = prefill(params, input_ids, attention_mask)
    state = SampleState(jnp.asarray(p), sequences, valid, cache, logits,
                        jnp.zeros((b,), bool), rng)

    def cond(s):
        return (s.step < t) & ~jnp.all(s.finished)

    def body(s):
        logits = process_logits(s.logits, s.sequences, s.valid, s.step, proc)
        if do_sample:
            logits = apply_temperature(logits, temperature)
            logits = apply_top_k(logits, top_k)
            logits = apply_top_p(logits, top_p)
            rng, sub = jax.random.split(s.rng)
            token = jax.random.categorical(sub, logits)
        else:
            rng = s.rng
            token = jnp.argmax(logits, axis=-1)
        token = jnp.where(s.finished, pad_token_id, token).astype(jnp.int32)
        finished = s.finished
        if eos_token_id is not None:
            finished = finished | (token == eos_token_id)
        sequences = jax.lax.dynamic_update_slice(
            s.sequences, token[:, None], (0, s.step))
        valid = jax.lax.dynamic_update_slice(
            s.valid, (~s.finished).astype(jnp.int32)[:, None], (0, s.step))
        new_logits, cache = decode(params, token[:, None], s.cache)
        return SampleState(s.step + 1, sequences, valid, cache, new_logits,
                           finished, rng)

    final = jax.lax.while_loop(cond, body, state)
    return final.sequences, final.valid


# -----------------------------------------------------------------------------
# beam search
# -----------------------------------------------------------------------------

class BeamState(NamedTuple):
    step: Any
    live_seqs: Any       # [B, K, T]
    live_scores: Any     # [B, K]
    fin_seqs: Any        # [B, K, T]
    fin_scores: Any      # [B, K]
    cache: Any           # flattened [B*K, ...]
    logits: Any          # [B*K, V]


def _flatten_beam(x, b, k):
    return x.reshape((b * k,) + x.shape[2:])


def _unflatten_beam(x, b, k):
    return x.reshape((b, k) + x.shape[1:])


def beam_search(prefill, decode, params, input_ids, attention_mask,
                max_length, num_beams=4, length_penalty=1.0,
                eos_token_id=None, pad_token_id=0, early_stopping=True,
                reindex_cache=None, do_sample=False, temperature=1.0,
                top_k=0, top_p=1.0, rng=None, num_beam_groups=1,
                diversity_penalty=0.0, num_return_sequences=1,
                **proc_config):
    """Static-shape beam search; returns best sequences [B, max_length], or
    the top `num_return_sequences` hypotheses [B, N, max_length] when N > 1
    (reference num_return_sequences semantics: finished hypotheses outrank
    live ones, as in the BeamSearchScorer finalize).

    reindex_cache(cache, flat_beam) must gather every per-beam cache leaf
    along its batch axis (flat_beam: int32 [B*K] of flat source lanes).
    Adapters attach it to their prefill fn (`prefill.reindex_cache`); shape
    guessing is not supported — a cache leaf whose non-batch dim happens to
    equal B*K would be silently corrupted by any heuristic."""
    if reindex_cache is None:
        reindex_cache = getattr(prefill, "reindex_cache", None)
    if reindex_cache is None:
        raise ValueError(
            "beam_search needs reindex_cache(cache, flat_beam): pass it "
            "explicitly or attach it to the prefill fn (see "
            "modelzoo/seq2seq_generation.py and models/gpt2/generation.py)")
    b, p = input_ids.shape
    k = num_beams
    t = max_length
    proc = dict(proc_config, eos_token_id=eos_token_id)

    # expand inputs to beams
    ids_bk = jnp.repeat(input_ids, k, axis=0)          # [B*K, P]
    mask_bk = jnp.repeat(attention_mask, k, axis=0)
    logits, cache = prefill(params, ids_bk, mask_bk)   # [B*K, V]

    assert k % num_beam_groups == 0, "num_beams % num_beam_groups != 0"
    g_count = num_beam_groups
    sub_k = k // g_count
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    live_seqs = jnp.full((b, k, t), pad_token_id, jnp.int32)
    live_seqs = jax.lax.dynamic_update_slice(
        live_seqs, _unflatten_beam(ids_bk, b, k), (0, 0, 0))
    # only beam 0 of each group is live initially (identical beams would
    # duplicate; reference group_beam_search keeps per-group frontiers)
    init_row = np.full((k,), NEG_INF, np.float32)
    init_row[::sub_k] = 0.0
    live_scores = jnp.tile(jnp.asarray(init_row), (b, 1))
    fin_seqs = jnp.full((b, k, t), pad_token_id, jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF, jnp.float32)

    def brevity(gen_len):
        # HF semantics: score = sum_logprobs / gen_len**length_penalty
        return jnp.power(jnp.maximum(gen_len, 1).astype(jnp.float32),
                         length_penalty)

    state = BeamState(jnp.asarray(p), live_seqs, live_scores, fin_seqs,
                      fin_scores, cache, logits)

    def cond(s):
        worst_fin = jnp.min(s.fin_scores, axis=1)
        # best achievable normalised score from any live beam
        horizon = brevity(s.step - p + 1) if early_stopping else brevity(t - p)
        improvable = jnp.any(
            worst_fin < jnp.max(s.live_scores, axis=1) / horizon)
        return (s.step < t) & improvable

    def _select(flat, n_sel, step_rng):
        """Candidate selection over [B, n*V]: deterministic top-k (beam
        search) or Gumbel-top-k sampling without replacement (beam-sample —
        reference generation_utils.py:1373; scores stay the true logprobs)."""
        if not do_sample:
            return jax.lax.top_k(flat, n_sel)
        u = jax.random.uniform(step_rng, flat.shape, minval=1e-20,
                               maxval=1.0)
        gumbel = -jnp.log(-jnp.log(u))
        noised = jnp.where(flat > NEG_INF / 2, flat + gumbel, flat)
        _, top_idx = jax.lax.top_k(noised, n_sel)
        return jnp.take_along_axis(flat, top_idx, axis=1), top_idx

    def body(s):
        v = s.logits.shape[-1]
        flat_seqs = _flatten_beam(s.live_seqs, b, k)
        valid = (flat_seqs != pad_token_id).astype(jnp.int32)
        logp_all = jax.nn.log_softmax(
            process_logits(s.logits, flat_seqs, valid, s.step, proc), axis=-1)
        if do_sample:
            warped = apply_temperature(
                logp_all, temperature)
            warped = apply_top_k(warped, top_k)
            warped = apply_top_p(warped, top_p)
            logp_all = jax.nn.log_softmax(warped, axis=-1)
        logp_all = _unflatten_beam(logp_all, b, k)       # [B, K, V]

        # per-group frontier update (reference group_beam_search :1148:
        # groups run sequentially within a step; later groups pay a
        # diversity penalty on tokens already chosen this step)
        token_counts = jnp.zeros((b, v), jnp.float32)
        live_parts, fin_score_parts, fin_seq_parts = [], [], []
        beam_parts, token_parts, score_parts = [], [], []
        for g in range(g_count):
            sl = slice(g * sub_k, (g + 1) * sub_k)
            logp = logp_all[:, sl]
            if diversity_penalty > 0.0 and g > 0:
                logp = logp - diversity_penalty * token_counts[:, None, :]
            cand = s.live_scores[:, sl, None] + logp     # [B, sub_k, V]
            flat = cand.reshape(b, sub_k * v)
            step_rng = jax.random.fold_in(rng, 0)
            if do_sample:
                step_rng = jax.random.fold_in(
                    jax.random.fold_in(rng, g), s.step)
            top_scores, top_idx = _select(flat, 2 * sub_k, step_rng)
            beam_idx = top_idx // v + g * sub_k          # global beam index
            token_idx = top_idx % v

            seqs = jnp.take_along_axis(s.live_seqs, beam_idx[..., None],
                                       axis=1)
            seqs = jax.vmap(
                lambda sq, tok, st: jax.vmap(
                    lambda row, tk: jax.lax.dynamic_update_slice(
                        row, tk[None].astype(jnp.int32), (st,)))(sq, tok),
                in_axes=(0, 0, None))(seqs, token_idx, s.step)  # [B,2sk,T]

            is_eos = (token_idx == eos_token_id) if eos_token_id is not None \
                else jnp.zeros_like(token_idx, bool)
            fin_score_parts.append(jnp.where(
                is_eos, top_scores / brevity(s.step - p + 1), NEG_INF))
            fin_seq_parts.append(seqs)

            live_cand = jnp.where(is_eos, NEG_INF, top_scores)
            live_top, live_sel = jax.lax.top_k(live_cand, sub_k)
            live_parts.append(jnp.take_along_axis(seqs,
                                                  live_sel[..., None], 1))
            chosen_beam = jnp.take_along_axis(beam_idx, live_sel, 1)
            chosen_token = jnp.take_along_axis(token_idx, live_sel, 1)
            beam_parts.append(chosen_beam)
            token_parts.append(chosen_token)
            score_parts.append(live_top)
            if diversity_penalty > 0.0:
                token_counts = token_counts + jax.nn.one_hot(
                    chosen_token, v, dtype=jnp.float32).sum(axis=1)

        live_seqs = jnp.concatenate(live_parts, axis=1)   # [B, K, T]
        live_top = jnp.concatenate(score_parts, axis=1)
        chosen_beam = jnp.concatenate(beam_parts, axis=1)
        chosen_token = jnp.concatenate(token_parts, axis=1)

        # update finished pool with every group's eos candidates
        all_fin_scores = jnp.concatenate([s.fin_scores] + fin_score_parts, 1)
        all_fin_seqs = jnp.concatenate([s.fin_seqs] + fin_seq_parts, 1)
        fin_top, fin_sel = jax.lax.top_k(all_fin_scores, k)
        fin_seqs = jnp.take_along_axis(all_fin_seqs, fin_sel[..., None], 1)

        # reindex cache to chosen beams: flat index = b*K + beam
        flat_beam = (jnp.arange(b)[:, None] * k + chosen_beam).reshape(-1)
        cache = reindex_cache(s.cache, flat_beam)

        tok = chosen_token.reshape(b * k, 1).astype(jnp.int32)
        new_logits, cache = decode(params, tok, cache)
        return BeamState(s.step + 1, live_seqs, live_top, fin_seqs, fin_top,
                         cache, new_logits)

    final = jax.lax.while_loop(cond, body, state)

    if num_return_sequences > 1:
        # reference finalize semantics: the pool is the finished hypotheses,
        # topped up with live beams (normalized) only below every finished
        # one — boost valid finished scores past any reachable live score
        n = min(num_return_sequences, k)
        live_norm = final.live_scores / brevity(
            jnp.maximum(final.step - p, 1))
        fin_keys = jnp.where(final.fin_scores > NEG_INF / 2,
                             final.fin_scores + 1e9, final.fin_scores)
        keys = jnp.concatenate([fin_keys, live_norm], axis=1)   # [B, 2K]
        seqs = jnp.concatenate([final.fin_seqs, final.live_seqs], axis=1)
        _, sel = jax.lax.top_k(keys, n)
        return jnp.take_along_axis(seqs, sel[..., None], axis=1)  # [B,N,T]

    # fall back to best live beam when nothing finished
    none_fin = jnp.all(final.fin_scores <= NEG_INF, axis=1)
    best_live = jnp.take_along_axis(
        final.live_seqs, jnp.argmax(final.live_scores, 1)[:, None, None], 1)[:, 0]
    best_fin = jnp.take_along_axis(
        final.fin_seqs, jnp.argmax(final.fin_scores, 1)[:, None, None], 1)[:, 0]
    return jnp.where(none_fin[:, None], best_live, best_fin)


# -----------------------------------------------------------------------------
# public entry
# -----------------------------------------------------------------------------

def generate(prefill, decode, params, input_ids, attention_mask,
             max_length=64, num_beams=1, do_sample=False, speculative=None,
             num_draft_tokens=8, ngram_size=2, **kwargs):
    """Dispatch to greedy / sample / beam / beam-sample / group-beam
    (reference generate :644, beam_sample :1373, group_beam_search :1148).

    speculative='prompt_lookup' enables draft-model-free speculative
    decoding (modelzoo/speculative.py) — token-exact vs plain greedy, and
    distribution-exact under sampling (ancestral conditionals, see the
    module docstring). Falls back silently when beams or a sequence-
    content-dependent processor (repetition penalty, no-repeat-ngram)
    rules it out, or when the adapter lacks chunk support."""
    if (speculative == "prompt_lookup" and num_beams == 1
            and hasattr(decode, "chunk")
            and not kwargs.get("repetition_penalty")
            and not kwargs.get("no_repeat_ngram_size")):
        from easynlp_tpu.modelzoo.speculative import speculative_greedy
        # verify chunks write K+1 entries straddling max_length before
        # rollback; without the slack, dynamic_update_slice would clamp the
        # write start and silently corrupt committed KV near the end
        slack = getattr(decode, "cache_slack", 0)
        if slack < num_draft_tokens + 1:
            raise ValueError(
                "speculative decoding needs cache_slack >= num_draft_tokens"
                " + 1 (= %d) KV slots past max_length, but the adapter was"
                " built with cache_slack=%d — pass cache_slack=%d to the"
                " generation-fns constructor"
                % (num_draft_tokens + 1, slack, num_draft_tokens + 1))
        for k in ("length_penalty", "num_beam_groups", "diversity_penalty",
                  "repetition_penalty", "no_repeat_ngram_size",
                  "num_return_sequences"):
            kwargs.pop(k, None)
        if not do_sample:
            for k in ("rng", "temperature", "top_k", "top_p"):
                kwargs.pop(k, None)
        if not do_sample and hasattr(decode, "chunk_rowwise"):
            # greedy: per-row acceptance (one slow row no longer drags the
            # batch to the min — see speculative_greedy_rowwise docstring)
            from easynlp_tpu.modelzoo.speculative import (
                speculative_greedy_rowwise)
            seqs, _, _ = speculative_greedy_rowwise(
                prefill, decode.chunk_rowwise, params, input_ids,
                attention_mask, max_length,
                num_draft_tokens=num_draft_tokens,
                ngram_size=ngram_size, **kwargs)
            return seqs
        seqs, _, _ = speculative_greedy(
            prefill, decode.chunk, decode.rollback, params, input_ids,
            attention_mask, max_length, num_draft_tokens=num_draft_tokens,
            ngram_size=ngram_size, do_sample=do_sample, **kwargs)
        return seqs
    if num_beams > 1:
        if not do_sample:
            kwargs.pop("rng", None)
            kwargs.pop("temperature", None)
            kwargs.pop("top_k", None)
            kwargs.pop("top_p", None)
        return beam_search(prefill, decode, params, input_ids, attention_mask,
                           max_length, num_beams=num_beams,
                           do_sample=do_sample, **kwargs)
    kwargs.pop("num_beam_groups", None)
    kwargs.pop("diversity_penalty", None)
    kwargs.pop("length_penalty", None)
    kwargs.pop("num_return_sequences", None)
    seqs, _ = greedy_or_sample(prefill, decode, params, input_ids,
                               attention_mask, max_length,
                               do_sample=do_sample, **kwargs)
    return seqs
