"""ARTIST prefill/decode adapters for generation_utils (image-code sampling
over the joint [text; image] vocab — reference easynlp/appzoo/
text2image_generation/model.py:300-380's top-k sampling loop, redesigned as a
static-shape KV-cache decode like models/gpt2/generation.py)."""

import jax
import jax.numpy as jnp


def make_artist_generation_fns(module, max_length, cache_dtype=None):
    """Returns (prefill, decode) closures over an ARTISTModel module."""
    from easynlp_tpu.modelzoo.models.artist.modeling_artist import ARTISTModel

    def prefill(params, input_ids, attention_mask):
        b, _ = input_ids.shape
        cache = module.init_lm_cache(b, max_length, dtype=cache_dtype)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], attention_mask.astype(jnp.int32), (0, 0))
        out = module.apply({"params": params}, input_ids=input_ids,
                           attention_mask=attention_mask, cache=cache,
                           method=ARTISTModel.lm_step)
        return out["logits"][:, -1].astype(jnp.float32), out["cache"]

    def decode(params, token, cache):
        b = token.shape[0]
        positions = jnp.sum(cache["mask"], axis=-1, keepdims=True)
        cache = dict(cache)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((b, 1), jnp.int32), (0, cache["index"]))
        out = module.apply({"params": params}, input_ids=token,
                           position_ids=positions, cache=cache,
                           method=ARTISTModel.lm_step)
        return out["logits"][:, -1].astype(jnp.float32), out["cache"]

    def reindex_cache(cache, flat_beam):
        return {
            "k": jnp.take(cache["k"], flat_beam, axis=1),
            "v": jnp.take(cache["v"], flat_beam, axis=1),
            "mask": jnp.take(cache["mask"], flat_beam, axis=0),
            "index": cache["index"],
        }

    prefill.reindex_cache = reindex_cache
    return prefill, decode
