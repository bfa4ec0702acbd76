"""GPT-2 prefill/decode adapters for generation_utils (decoder-only,
left-padded prompts)."""

import jax
import jax.numpy as jnp


def make_gpt2_generation_fns(module, max_length, cache_dtype=None,
                             cache_slack=0, kv_cache=None):
    """Returns (prefill, decode) closures over a GPT2LMHeadModel module.

    cache_slack: extra KV slots past max_length — speculative decoding
    (modelzoo/speculative.py) writes K+1-token verify chunks that may
    straddle the max_length boundary before being rolled back.
    kv_cache='int8': quantized KV cache (per-token-per-head scales) —
    halves the cache HBM stream for long-context serving."""
    from easynlp_tpu.modelzoo.quantization import dequantize_for
    if kv_cache not in (None, "int8"):
        raise ValueError("kv_cache must be None or 'int8' (got %r)"
                         % (kv_cache,))

    def prefill(params, input_ids, attention_mask):
        b, p = input_ids.shape
        cache = module.init_cache(b, max_length + cache_slack,
                                  dtype=cache_dtype,
                                  quantize=kv_cache == "int8")
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], attention_mask.astype(jnp.int32), (0, 0))
        out = module.apply({"params": dequantize_for(module, params)},
                           input_ids=input_ids,
                           attention_mask=attention_mask, cache=cache,
                           deterministic=True)
        return out["logits"][:, -1].astype(jnp.float32), out["cache"]

    def decode(params, token, cache):
        # int8 serving: dequant here, inside the decode-loop trace, so
        # weights stay int8 in HBM across steps and XLA fuses convert*scale
        # into each matmul (identity on unquantized trees)
        b = token.shape[0]
        positions = jnp.sum(cache["mask"], axis=-1, keepdims=True)  # [B,1]
        cache = dict(cache)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((b, 1), jnp.int32), (0, cache["index"]))
        out = module.apply({"params": dequantize_for(module, params)},
                           input_ids=token,
                           position_ids=positions, cache=cache,
                           deterministic=True)
        return out["logits"][:, -1].astype(jnp.float32), out["cache"]

    def decode_chunk(params, tokens, cache):
        """Verify forward for speculative decoding: feed [B, S] tokens at the
        cache's write index, return logits for ALL S positions [B, S, V].
        Intra-chunk causality is handled by the s>1 path in GPT2Attention
        (modeling_gpt2.py:76-84)."""
        b, s = tokens.shape
        # position ids = running count of real tokens per row (left-padded
        # prompts), matching the single-token decode's sum-of-mask semantics
        base = jnp.sum(cache["mask"], axis=-1, keepdims=True)       # [B, 1]
        positions = base + jnp.arange(s)[None, :]                   # [B, S]
        cache = dict(cache)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((b, s), jnp.int32), (0, cache["index"]))
        out = module.apply({"params": dequantize_for(module, params)},
                           input_ids=tokens,
                           position_ids=positions, cache=cache,
                           deterministic=True)
        return out["logits"].astype(jnp.float32), out["cache"]

    def decode_chunk_rowwise(params, tokens, cache):
        """Per-row verify chunk (speculative_greedy_rowwise): cache["index"]
        is a [B] array, so each row's S entries land at its own offset —
        scatter write + per-row causal bias in GPT2Attention
        (modeling_gpt2.py:67-98, the continuous-batching mechanism). The
        caller owns acceptance: it re-masks rejected positions and advances
        the index by the accepted length (no rollback)."""
        b, s = tokens.shape
        bidx = jnp.arange(b)
        base = jnp.sum(cache["mask"], axis=-1, keepdims=True)       # [B, 1]
        positions = base + jnp.arange(s)[None, :]                   # [B, S]
        pos = cache["index"][:, None] + jnp.arange(s)[None, :]
        cache = dict(cache)
        cache["mask"] = cache["mask"].at[bidx[:, None], pos].set(1)
        out = module.apply({"params": dequantize_for(module, params)},
                           input_ids=tokens,
                           position_ids=positions, cache=cache,
                           deterministic=True)
        return out["logits"].astype(jnp.float32), out["cache"]

    def rollback(cache, drop):
        """Invalidate the last `drop` cache entries (rejected draft tokens):
        pull the write index back and re-mask so they are invisible — the
        next chunk write overwrites them in place (gap-free cache)."""
        new_index = cache["index"] - drop
        t = cache["mask"].shape[1]
        mask = jnp.where(jnp.arange(t)[None, :] >= new_index, 0,
                         cache["mask"])
        return dict(cache, index=new_index, mask=mask)

    def reindex_cache(cache, flat_beam):
        """Beam gather with explicit batch axes: k/v (and int8 scales) are
        layer-stacked [L, B*K, ...] → axis 1; mask is [B*K, T] → axis 0;
        index is a shared scalar."""
        out = {
            "k": jnp.take(cache["k"], flat_beam, axis=1),
            "v": jnp.take(cache["v"], flat_beam, axis=1),
            "mask": jnp.take(cache["mask"], flat_beam, axis=0),
            "index": cache["index"],
        }
        if "k_scale" in cache:
            out["k_scale"] = jnp.take(cache["k_scale"], flat_beam, axis=1)
            out["v_scale"] = jnp.take(cache["v_scale"], flat_beam, axis=1)
        return out

    prefill.reindex_cache = reindex_cache
    decode.chunk = decode_chunk
    decode.rollback = rollback
    if kv_cache is None:
        # the per-row scatter path in GPT2Attention handles (k, v) caches
        # only; int8 KV keeps the batch-shared speculative variant
        decode.chunk_rowwise = decode_chunk_rowwise
    decode.cache_slack = cache_slack  # validated by the speculative path
    return prefill, decode
