"""TPU-native GPT-2.

Capability parity: reference easynlp/modelzoo/models/gpt2/modeling_gpt2.py —
pre-LN causal transformer, learned positions, tied LM head. TPU re-design:

- scanned layer stack (params carry a 'layers' axis), fused QKV matmul,
  Pallas causal flash attention with diagonal block skipping;
- decode-ready: a static-shape KV cache [L, B, T, H, D] threaded through the
  layer scan as scan xs/ys, so one jitted function serves prefill (causal
  attention over the prompt chunk) and single-token decode (attention over
  the cache with a validity mask) — generation_utils drives it inside
  lax.while_loop with no recompiles;
- batch generation uses LEFT-padded prompts (mask-aware position ids), the
  standard static-shape decoder-only layout.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert.modeling_bert import ACT2FN, REMAT_POLICIES
from easynlp_tpu.ops.attention import attention


def _dense(features, config, axes, name=None, dtype=jnp.float32):
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=nn.with_logical_partitioning(
            truncated_normal_init(config.initializer_range), axes),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros,
                                               (axes[-1],)),
        name=name)


def _ln(config, name=None):
    return nn.LayerNorm(
        epsilon=config.layer_norm_epsilon, dtype=jnp.float32,
        param_dtype=jnp.float32,
        scale_init=nn.with_logical_partitioning(nn.initializers.ones, ("embed",)),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, ("embed",)),
        name=name)


class GPT2Attention(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden, kv_mask, layer_cache=None, cache_index=None):
        c = self.config
        h, d = c.n_head, c.n_embd // c.n_head
        b, s, _ = hidden.shape
        qkv = _dense(3 * h * d, c, ("embed", "joined_kv"), dtype=self.dtype,
                     name="c_attn")(hidden)
        qkv = qkv.reshape(b, s, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if layer_cache is None:
            impl = "ring" if getattr(c, "use_ring_attention", False) \
                else "auto"
            ctx = attention(q, k, v, kv_mask=kv_mask, causal=True, impl=impl)
            new_cache = None
        elif cache_index is not None and getattr(cache_index, "ndim", 0) == 1:
            # per-SLOT write indices (continuous-batching decode): each row
            # advances independently, so the write is a scatter instead of a
            # shared dynamic_update_slice. Visibility is still the per-row
            # kv_mask. s == 1 is the plain decode step; s > 1 is a
            # speculative-verify chunk — S entries land at row offsets
            # cache_index..cache_index+S-1 and within-chunk causality is a
            # per-row additive bias (the [B,1,S,T] bias broadcasts over
            # heads; rejected drafts' stale KV stays invisible because the
            # caller only commits accepted positions into the mask).
            bidx = jnp.arange(b)
            k_cache, v_cache = layer_cache
            if s == 1:
                k_cache = k_cache.at[bidx, cache_index].set(
                    k[:, 0].astype(k_cache.dtype))
                v_cache = v_cache.at[bidx, cache_index].set(
                    v[:, 0].astype(v_cache.dtype))
                new_cache = (k_cache, v_cache)
                ctx = attention(q, k_cache, v_cache, kv_mask=kv_mask)
            else:
                pos = cache_index[:, None] + jnp.arange(s)[None, :]  # [B,S]
                k_cache = k_cache.at[bidx[:, None], pos].set(
                    k.astype(k_cache.dtype))
                v_cache = v_cache.at[bidx[:, None], pos].set(
                    v.astype(v_cache.dtype))
                new_cache = (k_cache, v_cache)
                t = k_cache.shape[1]
                bias = jnp.where(
                    jnp.arange(t)[None, None, :] <= pos[:, :, None],
                    0.0, -1e30)[:, None]                          # [B,1,S,T]
                ctx = attention(q, k_cache, v_cache, kv_mask=kv_mask,
                                bias=bias)
        else:
            if len(layer_cache) == 4:
                # int8 KV cache: per-(token, head) symmetric scales — halves
                # the decode-loop's cache HBM traffic (the dominant stream at
                # long context); XLA fuses convert*scale into the attention
                # einsum's operand read
                k_cache, v_cache, k_scale, v_scale = layer_cache
                ks = jnp.maximum(jnp.max(jnp.abs(k), axis=-1) / 127.0, 1e-8)
                vs = jnp.maximum(jnp.max(jnp.abs(v), axis=-1) / 127.0, 1e-8)
                k8 = jnp.clip(jnp.round(k / ks[..., None]),
                              -127, 127).astype(jnp.int8)
                v8 = jnp.clip(jnp.round(v / vs[..., None]),
                              -127, 127).astype(jnp.int8)
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k8, (0, cache_index, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v8, (0, cache_index, 0, 0))
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks.astype(k_scale.dtype), (0, cache_index, 0))
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs.astype(v_scale.dtype), (0, cache_index, 0))
                new_cache = (k_cache, v_cache, k_scale, v_scale)
                k_read = k_cache.astype(self.dtype) \
                    * k_scale[..., None].astype(self.dtype)
                v_read = v_cache.astype(self.dtype) \
                    * v_scale[..., None].astype(self.dtype)
            else:
                k_cache, v_cache = layer_cache
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k.astype(k_cache.dtype), (0, cache_index, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v.astype(v_cache.dtype), (0, cache_index, 0, 0))
                new_cache = (k_cache, v_cache)
                k_read, v_read = k_cache, v_cache
            if s == 1:
                # single-token decode: every valid cached position is visible
                ctx = attention(q, k_read, v_read, kv_mask=kv_mask)
            else:
                # chunked prefill at offset cache_index: causality handled by
                # masking cache positions > current q position
                t = k_read.shape[1]
                q_pos = cache_index + jnp.arange(s)
                k_pos = jnp.arange(t)
                bias = jnp.where(
                    (k_pos[None, :] <= q_pos[:, None])[None, None], 0.0, -1e30)
                ctx = attention(q, k_read, v_read, kv_mask=kv_mask, bias=bias)

        ctx = ctx.reshape(b, s, h * d)
        out = _dense(c.n_embd, c, ("joined_kv", "embed"), dtype=self.dtype,
                     name="c_proj")(ctx)
        out = nn.Dropout(c.resid_pdrop)(out, deterministic=self.deterministic)
        return out, new_cache


class GPT2Block(nn.Module):
    """Pre-LN block as a scan body: carry=(hidden, kv_mask, cache_index),
    xs=per-layer (k,v) cache or None."""

    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, layer_cache=None):
        hidden, kv_mask, cache_index = carry
        c = self.config
        normed = _ln(c, name="ln_1")(hidden).astype(self.dtype)
        attn_out, new_cache = GPT2Attention(
            c, dtype=self.dtype, deterministic=self.deterministic,
            name="attn")(normed, kv_mask, layer_cache, cache_index)
        hidden = hidden + attn_out
        normed = _ln(c, name="ln_2")(hidden).astype(self.dtype)
        aux = jnp.zeros((), jnp.float32)
        if getattr(c, "num_experts", 0) > 1:
            # gpt_moe: Switch-MoE FFN replaces the dense MLP (reference
            # examples/rapidformer/gpt_moe — external rapidformer there;
            # in-package here, expert-sharded via the `expert` logical axis)
            from easynlp_tpu.ops.moe import SwitchMoE
            mlp, aux = SwitchMoE(
                d_model=c.n_embd, d_ff=c.n_inner,
                num_experts=c.num_experts,
                top_k=getattr(c, "moe_top_k", 1),
                capacity_factor=getattr(c, "expert_capacity_factor", 1.25),
                activation=ACT2FN[c.activation_function],
                kernel_init=truncated_normal_init(c.initializer_range),
                dtype=self.dtype, name="moe")(
                normed, deterministic=self.deterministic)
        else:
            mlp = _dense(c.n_inner, c, ("embed", "mlp"), dtype=self.dtype,
                         name="c_fc")(normed)
            mlp = ACT2FN[c.activation_function](mlp)
            mlp = _dense(c.n_embd, c, ("mlp", "embed"), dtype=self.dtype,
                         name="c_proj")(mlp)
        mlp = nn.Dropout(c.resid_pdrop)(mlp, deterministic=self.deterministic)
        hidden = hidden + mlp
        return (hidden, kv_mask, cache_index), (new_cache, aux)


class GPT2Model(BaseModule):
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids=None, attention_mask=None, position_ids=None,
                 cache=None, deterministic=True, inputs_embeds=None):
        c = self.config
        if inputs_embeds is not None:
            b, s = inputs_embeds.shape[:2]
        else:
            b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if position_ids is None:
            position_ids = jnp.maximum(
                jnp.cumsum(attention_mask, axis=-1) - 1, 0)
        init = truncated_normal_init(c.initializer_range)
        wte = nn.Embed(c.vocab_size, c.n_embd, param_dtype=jnp.float32,
                       embedding_init=nn.with_logical_partitioning(
                           init, ("vocab", "embed")), name="wte")
        wpe = nn.Embed(c.n_positions, c.n_embd, param_dtype=jnp.float32,
                       embedding_init=nn.with_logical_partitioning(
                           init, ("length", "embed")), name="wpe")
        tok = wte(input_ids) if inputs_embeds is None else inputs_embeds
        hidden = tok + wpe(position_ids)
        hidden = nn.Dropout(c.embd_pdrop)(hidden, deterministic=deterministic)
        hidden = hidden.astype(self.dtype)

        if cache is None:
            kv_mask = attention_mask.astype(bool)
            xs = None
            cache_index = jnp.zeros((), jnp.int32)
        else:
            kv_mask = cache["mask"].astype(bool)
            xs = (cache["k"], cache["v"])
            if "k_scale" in cache:
                xs = xs + (cache["k_scale"], cache["v_scale"])
            cache_index = cache["index"]

        block_cls = GPT2Block
        if self.remat in REMAT_POLICIES:
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=c.n_layer,
            metadata_params={nn.PARTITION_NAME: "layers"},
            unroll=scan_unroll(c, c.n_layer),
        )
        (hidden, _, _), (new_caches, moe_aux) = scan(
            config=c, dtype=self.dtype, deterministic=deterministic,
            name="h")((hidden, kv_mask, cache_index), xs)
        hidden = _ln(c, name="ln_f")(hidden).astype(self.dtype)

        out = {"last_hidden_state": hidden}
        if getattr(c, "num_experts", 0) > 1:
            # per-layer Switch load-balance losses, stacked by the scan,
            # pre-scaled by the router coefficient
            out["moe_aux_loss"] = (
                jnp.float32(getattr(c, "router_aux_loss_coef", 0.01))
                * jnp.mean(moe_aux))
        if cache is not None:
            out["cache"] = {
                "k": new_caches[0], "v": new_caches[1],
                "index": cache_index + s,
                "mask": cache["mask"],
            }
            if len(new_caches) == 4:
                out["cache"]["k_scale"] = new_caches[2]
                out["cache"]["v_scale"] = new_caches[3]
        return out


class GPT2LMHeadModel(BaseModule):
    remat: str = "none"

    def setup(self):
        self.transformer = GPT2Model(self.config, dtype=self.dtype,
                                     remat=self.remat)

    def init_cache(self, batch_size, max_length, dtype=None, quantize=False):
        c = self.config
        h, d = c.n_head, c.n_embd // c.n_head
        dtype = dtype or self.dtype
        shape = (c.n_layer, batch_size, max_length, h, d)
        cache = {
            "index": jnp.zeros((), jnp.int32),
            "mask": jnp.zeros((batch_size, max_length), jnp.int32),
        }
        if quantize:
            # int8 KV + per-(token, head) scales (see GPT2Attention)
            cache["k"] = jnp.zeros(shape, jnp.int8)
            cache["v"] = jnp.zeros(shape, jnp.int8)
            cache["k_scale"] = jnp.zeros(shape[:-1], jnp.float32)
            cache["v_scale"] = jnp.zeros(shape[:-1], jnp.float32)
        else:
            cache["k"] = jnp.zeros(shape, dtype)
            cache["v"] = jnp.zeros(shape, dtype)
        return cache

    def __call__(self, input_ids, attention_mask=None, position_ids=None,
                 cache=None, deterministic=True):
        out = self.transformer(input_ids, attention_mask=attention_mask,
                               position_ids=position_ids, cache=cache,
                               deterministic=deterministic)
        wte = self.transformer.variables["params"]["wte"]["embedding"]
        wte = nn.unbox(wte)
        logits = jnp.einsum("bse,ve->bsv", out["last_hidden_state"],
                            wte.astype(self.dtype))
        out["logits"] = logits
        return out
