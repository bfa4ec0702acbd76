"""TPU-native T5 / mT5.

Capability parity: reference easynlp/modelzoo/models/t5/modeling_t5.py —
RMS (T5-)LayerNorm, bucketed relative-position bias shared across layers,
unscaled attention, optional gated FFN (mT5), tied embeddings with 1/√d logit
scaling.

TPU re-design: encoder/decoder are scanned layer stacks; the relative bias is
computed once per (Sq, Skv) pair outside the scan (T5 semantics: only layer 0
owns the bias embedding) and broadcast; decode runs on a static self-attn KV
cache + precomputed cross-attn KV, driven by generation_utils.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule
from easynlp_tpu.modelzoo.models.bert.modeling_bert import ACT2FN, REMAT_POLICIES
from easynlp_tpu.ops.attention import attention


def _t5_dense(features, axes, name=None, dtype=jnp.float32, std=1.0):
    return nn.Dense(features, use_bias=False, dtype=dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nn.with_logical_partitioning(
                        nn.initializers.normal(std), axes),
                    name=name)


class T5LayerNorm(nn.Module):
    """RMS norm, fp32, no bias/mean (reference T5LayerNorm)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale",
                           nn.with_logical_partitioning(
                               nn.initializers.ones, ("embed",)),
                           (x.shape[-1],), jnp.float32)
        return (x * scale).astype(dtype)


def relative_position_buckets(qpos, kpos, bidirectional, num_buckets=32,
                              max_distance=128):
    """T5 bucketing of (kpos - qpos)."""
    rel = kpos[None, :] - qpos[:, None]
    if bidirectional:
        num_buckets //= 2
        big = (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        big = jnp.zeros_like(rel)
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    log_ratio = jnp.log(rel.astype(jnp.float32) / max_exact + 1e-6) \
        / jnp.log(max_distance / max_exact)
    large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return big + jnp.where(is_small, rel, large)


class T5RelativeBias(nn.Module):
    config: Any
    bidirectional: bool = True

    @nn.compact
    def __call__(self, qpos, kpos):
        c = self.config
        table = self.param("rel_embedding",
                           nn.with_logical_partitioning(
                               nn.initializers.normal(1.0), (None, "heads")),
                           (c.relative_attention_num_buckets, c.num_heads),
                           jnp.float32)
        buckets = relative_position_buckets(
            qpos, kpos, self.bidirectional,
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance)
        bias = jnp.take(jnp.asarray(table), buckets, axis=0)  # [Sq, Skv, H]
        return bias.transpose(2, 0, 1)[None]                  # [1, H, Sq, Skv]


class T5Attention(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True
    kv_only: bool = False  # precompute mode: return projected (k, v) only

    @nn.compact
    def __call__(self, hidden, kv_hidden, kv_mask=None, bias=None, cache=None,
                 cache_index=None, static_kv=None, layer_idx=None):
        """cache: STACKED [L, B, T, H, D] (k, v) carried through the layer
        scan, written in place at (layer_idx, :, cache_index) — see
        modeling_gpt2.py's copy-free-decode note; same fix here."""
        c = self.config
        h, d = c.num_heads, c.d_kv
        if self.kv_only:
            skv = kv_hidden.shape[1]
            bk = kv_hidden.shape[0]
            k = _t5_dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                          name="k")(kv_hidden).reshape(bk, skv, h, d)
            v = _t5_dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                          name="v")(kv_hidden).reshape(bk, skv, h, d)
            return (k, v), None
        b, s, _ = hidden.shape
        q = _t5_dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                      name="q")(hidden).reshape(b, s, h, d)
        if static_kv is not None:
            k, v = static_kv
        else:
            skv = kv_hidden.shape[1]
            k = _t5_dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                          name="k")(kv_hidden).reshape(b, skv, h, d)
            v = _t5_dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                          name="v")(kv_hidden).reshape(b, skv, h, d)
        new_cache = None
        if cache is not None:
            k_full, v_full = cache
            k_full = jax.lax.dynamic_update_slice(
                k_full, k.astype(k_full.dtype)[None],
                (layer_idx, 0, cache_index, 0, 0))
            v_full = jax.lax.dynamic_update_slice(
                v_full, v.astype(v_full.dtype)[None],
                (layer_idx, 0, cache_index, 0, 0))
            k = jax.lax.dynamic_index_in_dim(k_full, layer_idx, 0, False)
            v = jax.lax.dynamic_index_in_dim(v_full, layer_idx, 0, False)
            new_cache = (k_full, v_full)
        # T5: no 1/sqrt(d) scaling; bias carries positions
        ctx = attention(q, k, v, kv_mask=kv_mask, scale=1.0, bias=bias)
        ctx = ctx.reshape(b, s, h * d)
        out = _t5_dense(c.d_model, ("joined_kv", "embed"), dtype=self.dtype,
                        name="o")(ctx)
        out = nn.Dropout(c.dropout_rate)(out, deterministic=self.deterministic)
        return out, new_cache


class T5FFN(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden):
        c = self.config
        act = ACT2FN[{"relu": "relu", "gelu": "gelu_new",
                      "gelu_new": "gelu_new", "silu": "silu"}[c.dense_act_fn]]
        if c.is_gated_act:
            wi0 = _t5_dense(c.d_ff, ("embed", "mlp"), dtype=self.dtype,
                            name="wi_0")(hidden)
            wi1 = _t5_dense(c.d_ff, ("embed", "mlp"), dtype=self.dtype,
                            name="wi_1")(hidden)
            x = act(wi0) * wi1
        else:
            x = act(_t5_dense(c.d_ff, ("embed", "mlp"), dtype=self.dtype,
                              name="wi")(hidden))
        x = nn.Dropout(c.dropout_rate)(x, deterministic=self.deterministic)
        return _t5_dense(c.d_model, ("mlp", "embed"), dtype=self.dtype,
                         name="wo")(x)


class T5Block(nn.Module):
    """Scan body. carry = (hidden, self_mask, enc_hidden, enc_mask, bias,
    cache_index, stacked self caches or None); xs = (layer index,
    per-layer cross kv or None). The self cache rides the CARRY (updated
    in place); the read-only cross kv stays scan xs."""

    config: Any
    dtype: Any = jnp.float32
    is_decoder: bool = False
    deterministic: bool = True
    kv_precompute: bool = False  # emit per-layer cross-attention (k, v) only

    @nn.compact
    def __call__(self, carry, xs=None):
        c = self.config
        if self.kv_precompute:
            kv, _ = T5Attention(c, dtype=self.dtype, kv_only=True,
                                name="cross_attn")(None, carry[2])
            return carry, kv
        (hidden, self_mask, enc_hidden, enc_mask, bias, cache_index,
         self_caches) = carry
        layer_idx, cross_kv = xs

        normed = T5LayerNorm(eps=c.layer_norm_epsilon, name="ln_self")(hidden)
        kv_src = normed
        attn_out, new_self_cache = T5Attention(
            c, dtype=self.dtype, deterministic=self.deterministic,
            name="self_attn")(normed, kv_src, self_mask, bias=bias,
                              cache=self_caches, cache_index=cache_index,
                              layer_idx=layer_idx)
        self_caches = new_self_cache if self_caches is not None \
            else self_caches
        hidden = hidden + attn_out

        if self.is_decoder and (enc_hidden is not None
                                or cross_kv is not None):
            normed = T5LayerNorm(eps=c.layer_norm_epsilon,
                                 name="ln_cross")(hidden)
            cross_out, _ = T5Attention(
                c, dtype=self.dtype, deterministic=self.deterministic,
                name="cross_attn")(normed, enc_hidden, enc_mask,
                                   static_kv=cross_kv)
            hidden = hidden + cross_out

        normed = T5LayerNorm(eps=c.layer_norm_epsilon, name="ln_ff")(hidden)
        ffn = T5FFN(c, dtype=self.dtype,
                    deterministic=self.deterministic, name="ffn")(normed)
        hidden = hidden + nn.Dropout(c.dropout_rate)(
            ffn, deterministic=self.deterministic)

        return (hidden, self_mask, enc_hidden, enc_mask, bias,
                cache_index, self_caches), None


class T5Stack(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    is_decoder: bool = False
    remat: str = "none"

    @nn.compact
    def __call__(self, hidden, self_mask, qpos, kpos, enc_hidden=None,
                 enc_mask=None, cache=None, cache_index=None,
                 deterministic=True, compute_cross_kv_only=False):
        c = self.config
        if compute_cross_kv_only:
            scan_kv = nn.scan(
                T5Block, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.num_decoder_layers,
                metadata_params={nn.PARTITION_NAME: "layers"})
            _, cross_kv = scan_kv(
                config=c, dtype=self.dtype, is_decoder=True,
                deterministic=deterministic, kv_precompute=True,
                name="layers")((None, None, enc_hidden, None, None, None))
            return cross_kv, None
        bias = T5RelativeBias(c, bidirectional=not self.is_decoder,
                              name="rel_bias")(qpos, kpos)
        if self.is_decoder and cache is None:
            # causal mask folded into the bias (decoder training)
            s = hidden.shape[1]
            causal = jnp.tril(jnp.ones((s, s), bool))
            bias = jnp.where(causal[None, None], bias, -1e30)
        elif self.is_decoder and hidden.shape[1] > 1:
            # cached multi-token decode (speculative verify chunks): the
            # kv_mask only restricts to < index + s, so intra-chunk
            # causality must come from absolute positions (no-op for s=1)
            bias = jnp.where((kpos[None, :] <= qpos[:, None])[None, None],
                             bias, -1e30)
        n_layers = c.num_decoder_layers if self.is_decoder else c.num_layers
        block_cls = T5Block
        if self.remat in REMAT_POLICIES:
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        scan = nn.scan(block_cls, variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=n_layers,
                       metadata_params={nn.PARTITION_NAME: "layers"},
                       unroll=scan_unroll(c, n_layers))
        idx = cache_index if cache_index is not None else jnp.zeros((), jnp.int32)
        self_caches = cross = None
        if cache is not None:
            self_caches = (cache[0], cache[1])
            if self.is_decoder and len(cache) > 2:
                cross = (cache[2], cache[3])
        carry, _ = scan(
            config=c, dtype=self.dtype, is_decoder=self.is_decoder,
            deterministic=deterministic, name="layers")(
            (hidden, self_mask, enc_hidden, enc_mask, bias, idx,
             self_caches), (jnp.arange(n_layers), cross))
        hidden = carry[0]
        new_cache = carry[6]
        hidden = T5LayerNorm(eps=c.layer_norm_epsilon,
                             name="final_ln")(hidden)
        hidden = nn.Dropout(c.dropout_rate)(hidden,
                                            deterministic=deterministic)
        return hidden.astype(self.dtype), new_cache


class T5ForConditionalGeneration(BaseModule):
    remat: str = "none"

    def setup(self):
        c = self.config
        self.shared = nn.Embed(
            c.vocab_size, c.d_model, param_dtype=jnp.float32,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(1.0), ("vocab", "embed")),
            name="shared")
        self.encoder = T5Stack(c, dtype=self.dtype, is_decoder=False,
                               remat=self.remat)
        self.decoder = T5Stack(c, dtype=self.dtype, is_decoder=True,
                               remat=self.remat)

    def encode(self, input_ids, attention_mask=None, deterministic=True):
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        hidden = self.shared(input_ids).astype(self.dtype)
        pos = jnp.arange(s)
        enc, _ = self.encoder(hidden, attention_mask.astype(bool), pos, pos,
                              deterministic=deterministic)
        return enc

    def decode(self, decoder_input_ids, enc_hidden, enc_mask,
               decoder_mask=None, cache=None, cache_index=None,
               positions=None, deterministic=True):
        c = self.config
        b, s = decoder_input_ids.shape
        hidden = self.shared(decoder_input_ids).astype(self.dtype)
        if cache is None:
            qpos = kpos = jnp.arange(s)
            self_mask = (decoder_mask if decoder_mask is not None
                         else jnp.ones((b, s), jnp.int32)).astype(bool)
        else:
            t = cache[0].shape[2]  # [L, B, T, H, D]
            qpos = (positions if positions is not None
                    else jnp.full((1,), 0, jnp.int32))
            kpos = jnp.arange(t)
            self_mask = (jnp.broadcast_to(jnp.arange(t) < cache_index + s,
                                          (b, t))
                         if decoder_mask is None else decoder_mask)
        # cache may be (self_k, self_v) or (self_k, self_v, cross_k, cross_v)
        dec, new_cache = self.decoder(
            hidden, self_mask.astype(bool), qpos, kpos,
            enc_hidden=enc_hidden, enc_mask=enc_mask.astype(bool),
            cache=cache, cache_index=cache_index, deterministic=deterministic)
        if cache is not None and len(cache) > 2:
            new_cache = (new_cache[0], new_cache[1], cache[2], cache[3])
        if c.tie_word_embeddings:
            dec = dec * (c.d_model ** -0.5)
            logits = jnp.einsum("bse,ve->bsv", dec,
                                self.shared.embedding.astype(self.dtype))
        else:
            logits = _t5_dense(c.vocab_size, ("embed", "vocab"),
                               dtype=jnp.float32, name="lm_head")(dec)
        return logits, new_cache

    def init_cache(self, batch_size, max_length, dtype=None):
        c = self.config
        dtype = dtype or self.dtype
        shape = (c.num_decoder_layers, batch_size, max_length, c.num_heads,
                 c.d_kv)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def precompute_cross_kv(self, enc_hidden):
        """Per-layer cross-attention (k, v) [L, B, Senc, H, D] computed once
        at prefill; decode then skips the per-step k/v projections."""
        cross_kv, _ = self.decoder(None, None, None, None,
                                   enc_hidden=enc_hidden,
                                   compute_cross_kv_only=True)
        return cross_kv

    def __call__(self, input_ids, attention_mask=None, decoder_input_ids=None,
                 decoder_attention_mask=None, deterministic=True):
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        enc = self.encode(input_ids, attention_mask, deterministic)
        if decoder_input_ids is None:
            decoder_input_ids = jnp.full((b, 1),
                                         self.config.decoder_start_token_id,
                                         jnp.int32)
        logits, _ = self.decode(decoder_input_ids, enc, attention_mask,
                                decoder_mask=decoder_attention_mask,
                                deterministic=deterministic)
        return {"logits": logits, "encoder_last_hidden_state": enc}
