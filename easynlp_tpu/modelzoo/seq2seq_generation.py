"""Encoder-decoder prefill/decode adapters (T5/BART/Pegasus/Randeng) for generation_utils.

Encoder-decoder generation: the 'prompt' fed to generation_utils is just the
decoder start token ([B,1]); the source sentence is closed over, encoded once
in prefill, and its encoding is repeated across beams automatically (prefill
sees [B·K, 1] ids under beam search)."""

import jax
import jax.numpy as jnp


def make_encoder_decoder_fns(module, max_length, src_ids, src_mask,
                           cache_dtype=None, cache_slack=0):
    from easynlp_tpu.modelzoo.quantization import dequantize_for

    def prefill(raw_params, decoder_start_ids, decoder_start_mask):
        # int8 serving: dequant inside the trace (identity when unquantized)
        params = dequantize_for(module, raw_params)
        bk = decoder_start_ids.shape[0]
        b = src_ids.shape[0]
        k = bk // b
        enc = module.apply({"params": params}, src_ids, src_mask,
                           method=module.encode)
        enc_mask = src_mask
        if k > 1:
            enc = jnp.repeat(enc, k, axis=0)
            enc_mask = jnp.repeat(src_mask, k, axis=0)
        self_cache = module.apply({"params": params}, bk,
                                  max_length + cache_slack,
                                  dtype=cache_dtype,
                                  method=module.init_cache)
        if hasattr(module, "precompute_cross_kv"):
            cross_k, cross_v = module.apply({"params": params}, enc,
                                            method=module.precompute_cross_kv)
            self_cache = (self_cache[0], self_cache[1], cross_k, cross_v)
        logits, self_cache = module.apply(
            {"params": params}, decoder_start_ids, enc, enc_mask,
            cache=self_cache, cache_index=jnp.zeros((), jnp.int32),
            positions=jnp.zeros((1,), jnp.int32),
            method=module.decode)
        state = {"self": self_cache, "enc": enc, "enc_mask": enc_mask,
                 "index": jnp.ones((), jnp.int32)}
        return logits[:, -1].astype(jnp.float32), state

    def decode(raw_params, token, state):
        params = dequantize_for(module, raw_params)
        logits, self_cache = module.apply(
            {"params": params}, token, state["enc"], state["enc_mask"],
            cache=state["self"], cache_index=state["index"],
            positions=state["index"][None],
            method=module.decode)
        new_state = {"self": self_cache, "enc": state["enc"],
                     "enc_mask": state["enc_mask"],
                     "index": state["index"] + 1}
        return logits[:, -1].astype(jnp.float32), new_state

    def decode_chunk(raw_params, tokens, state):
        """Verify forward for speculative decoding: [B, S] tokens at the
        decoder cache index, logits for ALL S positions. Intra-chunk
        causality is folded into the cached-decode masks/bias by the
        modeling code (bart/t5 s>1 paths)."""
        params = dequantize_for(module, raw_params)
        s = tokens.shape[1]
        logits, self_cache = module.apply(
            {"params": params}, tokens, state["enc"], state["enc_mask"],
            cache=state["self"], cache_index=state["index"],
            positions=state["index"] + jnp.arange(s),
            method=module.decode)
        new_state = {"self": self_cache, "enc": state["enc"],
                     "enc_mask": state["enc_mask"],
                     "index": state["index"] + s}
        return logits.astype(jnp.float32), new_state

    def rollback(state, drop):
        # decoder visibility is derived from the index (arange < index + s),
        # so pulling the index back is the whole rollback
        return dict(state, index=state["index"] - drop)

    def reindex_cache(state, flat_beam):
        """Beam gather with explicit batch axes: self-attn KV (and precomputed
        cross KV) are layer-stacked [L, B*K, ...] → axis 1; enc/enc_mask are
        [B*K, ...] → axis 0; the step index is shared."""
        return {
            "self": tuple(jnp.take(x, flat_beam, axis=1)
                          for x in state["self"]),
            "enc": jnp.take(state["enc"], flat_beam, axis=0),
            "enc_mask": jnp.take(state["enc_mask"], flat_beam, axis=0),
            "index": state["index"],
        }

    prefill.reindex_cache = reindex_cache
    decode.chunk = decode_chunk
    decode.rollback = rollback
    decode.cache_slack = cache_slack  # validated by the speculative path
    return prefill, decode


def encoder_decoder_generate(module, params, src_ids, src_mask, max_length=64,
                num_beams=1, do_sample=False, **kwargs):
    """Convenience wrapper: source → generated decoder ids [B, max_length]."""
    import numpy as np

    from easynlp_tpu.modelzoo.generation_utils import generate

    b = src_ids.shape[0]
    start = jnp.full((b, 1), module.config.decoder_start_token_id, jnp.int32)
    start_mask = jnp.ones((b, 1), jnp.int32)
    slack = (kwargs.get("num_draft_tokens", 8) + 1
             if kwargs.get("speculative") else 0)
    prefill, decode = make_encoder_decoder_fns(module, max_length, src_ids,
                                             src_mask, cache_slack=slack)
    kwargs.setdefault("eos_token_id", module.config.eos_token_id)
    kwargs.setdefault("pad_token_id", module.config.pad_token_id)
    return generate(prefill, decode, params, start, start_mask,
                    max_length=max_length, num_beams=num_beams,
                    do_sample=do_sample, **kwargs)
