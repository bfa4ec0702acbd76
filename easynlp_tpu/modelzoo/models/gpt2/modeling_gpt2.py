"""TPU-native GPT-2.

Capability parity: reference easynlp/modelzoo/models/gpt2/modeling_gpt2.py —
pre-LN causal transformer, learned positions, tied LM head. TPU re-design:

- scanned layer stack (params carry a 'layers' axis), fused QKV matmul,
  Pallas causal flash attention with diagonal block skipping;
- decode-ready: a static-shape KV cache [L, B, T, H, D] carried through the
  layer scan and updated IN PLACE at (layer_idx, :, cache_index) — scanning
  per-layer slices through scan ys instead was measured rebuilding the whole
  stacked cache every decode step (2 full-cache copies + stacked rewrites =
  77% of v5e step time); one jitted function serves prefill (causal
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
    def __call__(self, hidden, kv_mask, caches=None, cache_index=None,
                 layer_idx=None):
        """caches: STACKED [L, ...] cache arrays ((k, v) or int8
        (k, v, k_scale, v_scale)) carried through the layer scan, written
        in place at `layer_idx` — carrying the stack (instead of scanning
        per-layer slices through scan ys) is what keeps the decode
        while_loop copy-free: the profiled scan-ys form rebuilt the whole
        [L, B, T, H, D] cache every step (2 full-cache copies + stacked
        rewrites = 77% of decode step time on v5e), while a
        dynamic_update_slice at (layer_idx, :, cache_index) writes only
        the new token's slots and XLA aliases the while-loop carry."""
        c = self.config
        h, d = c.n_head, c.n_embd // c.n_head
        b, s, _ = hidden.shape
        qkv = _dense(3 * h * d, c, ("embed", "joined_kv"), dtype=self.dtype,
                     name="c_attn")(hidden)
        qkv = qkv.reshape(b, s, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if caches is None:
            impl = "ring" if getattr(c, "use_ring_attention", False) \
                else "auto"
            ctx = attention(q, k, v, kv_mask=kv_mask, causal=True, impl=impl)
            new_caches = None
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
            k_full, v_full = caches
            li = layer_idx
            if s == 1:
                k_full = k_full.at[li, bidx, cache_index].set(
                    k[:, 0].astype(k_full.dtype))
                v_full = v_full.at[li, bidx, cache_index].set(
                    v[:, 0].astype(v_full.dtype))
                k_read = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
                v_read = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
                new_caches = (k_full, v_full)
                ctx = attention(q, k_read, v_read, kv_mask=kv_mask)
            else:
                pos = cache_index[:, None] + jnp.arange(s)[None, :]  # [B,S]
                k_full = k_full.at[li, bidx[:, None], pos].set(
                    k.astype(k_full.dtype))
                v_full = v_full.at[li, bidx[:, None], pos].set(
                    v.astype(v_full.dtype))
                k_read = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
                v_read = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
                new_caches = (k_full, v_full)
                t = k_full.shape[2]
                bias = jnp.where(
                    jnp.arange(t)[None, None, :] <= pos[:, :, None],
                    0.0, -1e30)[:, None]                          # [B,1,S,T]
                ctx = attention(q, k_read, v_read, kv_mask=kv_mask,
                                bias=bias)
        else:
            li = layer_idx
            if len(caches) == 4:
                # int8 KV cache: per-(token, head) symmetric scales — halves
                # the decode-loop's cache HBM traffic (the dominant stream at
                # long context); XLA fuses convert*scale into the attention
                # einsum's operand read
                k_full, v_full, ks_full, vs_full = caches
                ks = jnp.maximum(jnp.max(jnp.abs(k), axis=-1) / 127.0, 1e-8)
                vs = jnp.maximum(jnp.max(jnp.abs(v), axis=-1) / 127.0, 1e-8)
                k8 = jnp.clip(jnp.round(k / ks[..., None]),
                              -127, 127).astype(jnp.int8)
                v8 = jnp.clip(jnp.round(v / vs[..., None]),
                              -127, 127).astype(jnp.int8)
                k_full = jax.lax.dynamic_update_slice(
                    k_full, k8[None], (li, 0, cache_index, 0, 0))
                v_full = jax.lax.dynamic_update_slice(
                    v_full, v8[None], (li, 0, cache_index, 0, 0))
                ks_full = jax.lax.dynamic_update_slice(
                    ks_full, ks.astype(ks_full.dtype)[None],
                    (li, 0, cache_index, 0))
                vs_full = jax.lax.dynamic_update_slice(
                    vs_full, vs.astype(vs_full.dtype)[None],
                    (li, 0, cache_index, 0))
                new_caches = (k_full, v_full, ks_full, vs_full)
                k_read = jax.lax.dynamic_index_in_dim(k_full, li, 0, False) \
                    .astype(self.dtype) \
                    * jax.lax.dynamic_index_in_dim(ks_full, li, 0, False)[
                        ..., None].astype(self.dtype)
                v_read = jax.lax.dynamic_index_in_dim(v_full, li, 0, False) \
                    .astype(self.dtype) \
                    * jax.lax.dynamic_index_in_dim(vs_full, li, 0, False)[
                        ..., None].astype(self.dtype)
            else:
                k_full, v_full = caches
                k_full = jax.lax.dynamic_update_slice(
                    k_full, k.astype(k_full.dtype)[None],
                    (li, 0, cache_index, 0, 0))
                v_full = jax.lax.dynamic_update_slice(
                    v_full, v.astype(v_full.dtype)[None],
                    (li, 0, cache_index, 0, 0))
                new_caches = (k_full, v_full)
                k_read = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
                v_read = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
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
        return out, new_caches


class GPT2Block(nn.Module):
    """Pre-LN block as a scan body: carry=(hidden, kv_mask, cache_index,
    stacked caches or None), xs=the layer index. The KV cache rides the
    CARRY (updated in place at (layer_idx, :, cache_index)) instead of
    scan ys — see GPT2Attention.__call__ for why."""

    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, layer_idx):
        hidden, kv_mask, cache_index, caches = carry
        c = self.config
        normed = _ln(c, name="ln_1")(hidden).astype(self.dtype)
        attn_out, caches = GPT2Attention(
            c, dtype=self.dtype, deterministic=self.deterministic,
            name="attn")(normed, kv_mask, caches, cache_index, layer_idx)
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
        return (hidden, kv_mask, cache_index, caches), aux


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
            caches = None
            cache_index = jnp.zeros((), jnp.int32)
        else:
            kv_mask = cache["mask"].astype(bool)
            caches = (cache["k"], cache["v"])
            if "k_scale" in cache:
                caches = caches + (cache["k_scale"], cache["v_scale"])
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
        (hidden, _, _, new_caches), moe_aux = scan(
            config=c, dtype=self.dtype, deterministic=deterministic,
            name="h")((hidden, kv_mask, cache_index, caches),
                      jnp.arange(c.n_layer))
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
