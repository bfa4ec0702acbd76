"""TPU-native BART / Pegasus / Randeng.

Capability parity: reference easynlp/modelzoo/models/{bart,pegasus,randeng}/
modeling — encoder-decoder transformer with learned (BART, offset 2) or
sinusoidal (Pegasus) positions, post-LN (BART) or pre-LN (Pegasus) blocks,
tied LM head with optional final-logits bias.

Same TPU shape as the other families: scanned layers, fused QKV, static
decode cache; generation via the shared generation_utils loop.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert.modeling_bert import ACT2FN, REMAT_POLICIES
from easynlp_tpu.ops.attention import attention


def _dense(features, axes, name=None, dtype=jnp.float32, use_bias=True):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nn.with_logical_partitioning(
                        truncated_normal_init(0.02), axes),
                    bias_init=nn.with_logical_partitioning(
                        nn.initializers.zeros, (axes[-1],)),
                    name=name)


def _ln(name=None):
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        scale_init=nn.with_logical_partitioning(
                            nn.initializers.ones, ("embed",)),
                        bias_init=nn.with_logical_partitioning(
                            nn.initializers.zeros, ("embed",)),
                        name=name)


def sinusoidal_positions(n_pos, dim):
    """Pegasus/Marian layout (reference models/pegasus/modeling_pegasus.py
    PegasusSinusoidalPositionalEmbedding, also randeng): the first dim/2
    columns are sin, the last dim/2 are cos — NOT interleaved."""
    pos = np.arange(n_pos)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(np.log(10000.0) / dim))
    table = np.zeros((n_pos, dim), np.float32)
    half = (dim + 1) // 2
    table[:, :half] = np.sin(pos * div)
    table[:, half:] = np.cos(pos * div)[:, : dim - half]
    return jnp.asarray(table)


class BartAttention(nn.Module):
    config: Any
    num_heads: int
    dtype: Any = jnp.float32
    causal: bool = False
    deterministic: bool = True
    kv_only: bool = False

    @nn.compact
    def __call__(self, hidden, kv_hidden, kv_mask=None, cache=None,
                 cache_index=None, static_kv=None, layer_idx=None):
        """cache: STACKED [L, B, T, H, D] (k, v) carried through the layer
        scan and written in place at (layer_idx, :, cache_index) — the
        scan-ys form rebuilt the whole stacked cache every decode step
        (see modeling_gpt2.py's note; same fix here)."""
        c = self.config
        h = self.num_heads
        d = c.d_model // h
        if self.kv_only:
            bk, skv = kv_hidden.shape[:2]
            k = _dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                       name="k_proj")(kv_hidden).reshape(bk, skv, h, d)
            v = _dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                       name="v_proj")(kv_hidden).reshape(bk, skv, h, d)
            return (k, v), None
        b, s, _ = hidden.shape
        q = _dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                   name="q_proj")(hidden).reshape(b, s, h, d)
        if static_kv is not None:
            k, v = static_kv
        else:
            skv = kv_hidden.shape[1]
            k = _dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                       name="k_proj")(kv_hidden).reshape(b, skv, h, d)
            v = _dense(h * d, ("embed", "joined_kv"), dtype=self.dtype,
                       name="v_proj")(kv_hidden).reshape(b, skv, h, d)
        new_cache = None
        causal = self.causal
        bias = None
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
            # s == 1: kv_mask (arange < index + s) already restricts to
            # <= current pos. s > 1 (speculative verify chunks): add
            # intra-chunk causality by absolute position.
            causal = False
            if self.causal and s > 1:
                q_pos = cache_index + jnp.arange(s)
                k_pos = jnp.arange(k.shape[1])
                bias = jnp.where(
                    (k_pos[None, :] <= q_pos[:, None])[None, None],
                    0.0, -1e30)
        ctx = attention(q, k, v, kv_mask=kv_mask, causal=causal, bias=bias)
        ctx = ctx.reshape(b, s, h * d)
        out = _dense(c.d_model, ("joined_kv", "embed"), dtype=self.dtype,
                     name="out_proj")(ctx)
        out = nn.Dropout(c.dropout)(out, deterministic=self.deterministic)
        return out, new_cache


class BartLayer(nn.Module):
    """Scan body: carry = (hidden, self_mask, enc_hidden, enc_mask,
    cache_index, stacked self caches or None), xs = (layer index,
    per-layer cross kv or None). The self cache rides the CARRY (updated
    in place at (layer_idx, :, cache_index)); the read-only cross kv
    stays scan xs."""

    config: Any
    num_heads: int
    ffn_dim: int
    dtype: Any = jnp.float32
    is_decoder: bool = False
    deterministic: bool = True
    kv_precompute: bool = False

    @nn.compact
    def __call__(self, carry, xs=None):
        c = self.config
        if self.kv_precompute:
            kv, _ = BartAttention(c, self.num_heads, dtype=self.dtype,
                                  kv_only=True, name="encoder_attn")(
                None, carry[2])
            return carry, kv
        hidden, self_mask, enc_hidden, enc_mask, cache_index, \
            self_caches = carry
        layer_idx, cross_kv = xs
        pre = c.normalize_before

        residual = hidden
        x = _ln(name="self_attn_layer_norm")(hidden).astype(self.dtype) \
            if pre else hidden
        attn_out, self_caches = BartAttention(
            c, self.num_heads, dtype=self.dtype, causal=self.is_decoder,
            deterministic=self.deterministic, name="self_attn")(
            x, x, self_mask, cache=self_caches, cache_index=cache_index,
            layer_idx=layer_idx)
        hidden = residual + attn_out
        if not pre:
            hidden = _ln(name="self_attn_layer_norm")(
                hidden).astype(self.dtype)

        if self.is_decoder and enc_hidden is not None:
            residual = hidden
            x = _ln(name="encoder_attn_layer_norm")(
                hidden).astype(self.dtype) if pre else hidden
            cross_out, _ = BartAttention(
                c, self.num_heads, dtype=self.dtype, causal=False,
                deterministic=self.deterministic, name="encoder_attn")(
                x, enc_hidden, enc_mask, static_kv=cross_kv)
            hidden = residual + cross_out
            if not pre:
                hidden = _ln(name="encoder_attn_layer_norm")(
                    hidden).astype(self.dtype)

        residual = hidden
        x = _ln(name="final_layer_norm")(hidden).astype(self.dtype) \
            if pre else hidden
        x = _dense(self.ffn_dim, ("embed", "mlp"), dtype=self.dtype,
                   name="fc1")(x)
        x = ACT2FN[c.activation_function](x)
        x = nn.Dropout(c.activation_dropout)(
            x, deterministic=self.deterministic)
        x = _dense(c.d_model, ("mlp", "embed"), dtype=self.dtype,
                   name="fc2")(x)
        x = nn.Dropout(c.dropout)(x, deterministic=self.deterministic)
        hidden = residual + x
        if not pre:
            hidden = _ln(name="final_layer_norm")(hidden).astype(self.dtype)
        return (hidden, self_mask, enc_hidden, enc_mask, cache_index,
                self_caches), None


class BartStack(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    is_decoder: bool = False
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, self_mask, positions, enc_hidden=None,
                 enc_mask=None, cache=None, cache_index=None,
                 deterministic=True, compute_cross_kv_only=False):
        c = self.config
        if compute_cross_kv_only:
            scan_kv = nn.scan(
                BartLayer, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.decoder_layers,
                metadata_params={nn.PARTITION_NAME: "layers"})
            _, cross_kv = scan_kv(
                config=c, num_heads=c.decoder_attention_heads,
                ffn_dim=c.decoder_ffn_dim, dtype=self.dtype, is_decoder=True,
                deterministic=deterministic, kv_precompute=True,
                name="layers")((None, None, enc_hidden, None, None))
            return cross_kv, None
        embed = nn.Embed(c.vocab_size, c.d_model, param_dtype=jnp.float32,
                         embedding_init=nn.with_logical_partitioning(
                             truncated_normal_init(0.02), ("vocab", "embed")),
                         name="embed_tokens")
        x = embed(input_ids)
        if c.scale_embedding:
            x = x * jnp.sqrt(jnp.float32(c.d_model))
        if c.position_type == "learned":
            pos_table = self.param(
                "embed_positions",
                nn.with_logical_partitioning(truncated_normal_init(0.02),
                                             ("length", "embed")),
                (c.max_position_embeddings + c.position_offset, c.d_model),
                jnp.float32)
            x = x + jnp.take(jnp.asarray(pos_table),
                             positions + c.position_offset, axis=0)
        else:
            table = sinusoidal_positions(c.max_position_embeddings, c.d_model)
            x = x + jnp.take(table, positions, axis=0)
        if c.use_layernorm_embedding:
            x = _ln(name="layernorm_embedding")(x)
        x = nn.Dropout(c.dropout)(x.astype(self.dtype),
                                  deterministic=deterministic)
        x = x.astype(self.dtype)

        n_layers = c.decoder_layers if self.is_decoder else c.encoder_layers
        heads = (c.decoder_attention_heads if self.is_decoder
                 else c.encoder_attention_heads)
        ffn = c.decoder_ffn_dim if self.is_decoder else c.encoder_ffn_dim
        block_cls = BartLayer
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
            config=c, num_heads=heads, ffn_dim=ffn, dtype=self.dtype,
            is_decoder=self.is_decoder, deterministic=deterministic,
            name="layers")((x, self_mask, enc_hidden, enc_mask, idx,
                            self_caches),
                           (jnp.arange(n_layers), cross))
        x = carry[0]
        if c.final_layer_norm:
            x = _ln(name="layer_norm")(x)
        return x.astype(self.dtype), carry[5]


class BartForConditionalGeneration(BaseModule):
    remat: str = "none"

    def setup(self):
        c = self.config
        self.encoder = BartStack(c, dtype=self.dtype, is_decoder=False,
                                 remat=self.remat)
        self.decoder = BartStack(c, dtype=self.dtype, is_decoder=True,
                                 remat=self.remat)
        self.final_logits_bias = self.param(
            "final_logits_bias",
            nn.with_logical_partitioning(nn.initializers.zeros, ("vocab",)),
            (c.vocab_size,), jnp.float32)

    def encode(self, input_ids, attention_mask=None, deterministic=True):
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        enc, _ = self.encoder(input_ids, attention_mask.astype(bool),
                              jnp.arange(s), deterministic=deterministic)
        return enc

    def decode(self, decoder_input_ids, enc_hidden, enc_mask,
               decoder_mask=None, cache=None, cache_index=None,
               positions=None, deterministic=True):
        c = self.config
        b, s = decoder_input_ids.shape
        if cache is None:
            pos = jnp.arange(s)
            self_mask = (decoder_mask if decoder_mask is not None
                         else jnp.ones((b, s), jnp.int32)).astype(bool)
        else:
            t = cache[0].shape[2]
            pos = positions if positions is not None else jnp.zeros((1,), jnp.int32)
            self_mask = jnp.broadcast_to(
                jnp.arange(t) < cache_index + s, (b, t))
        dec, new_cache = self.decoder(
            decoder_input_ids, self_mask, pos, enc_hidden=enc_hidden,
            enc_mask=enc_mask.astype(bool), cache=cache,
            cache_index=cache_index, deterministic=deterministic)
        if cache is not None and len(cache) > 2:
            new_cache = (new_cache[0], new_cache[1], cache[2], cache[3])
        # tied LM head via the DECODER token embedding (BART ties all three)
        embedding = self.decoder.variables["params"]["embed_tokens"]["embedding"]
        embedding = nn.unbox(embedding)
        logits = jnp.einsum("bse,ve->bsv", dec,
                            jnp.asarray(embedding).astype(self.dtype))
        logits = logits + self.final_logits_bias.astype(self.dtype)
        return logits, new_cache

    def init_cache(self, batch_size, max_length, dtype=None):
        c = self.config
        h = c.decoder_attention_heads
        d = c.d_model // h
        dtype = dtype or self.dtype
        shape = (c.decoder_layers, batch_size, max_length, h, d)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def precompute_cross_kv(self, enc_hidden):
        cross_kv, _ = self.decoder(None, None, None,
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
            decoder_input_ids = jnp.full(
                (b, 1), self.config.decoder_start_token_id, jnp.int32)
        logits, _ = self.decode(decoder_input_ids, enc, attention_mask,
                                decoder_mask=decoder_attention_mask,
                                deterministic=deterministic)
        return {"logits": logits, "encoder_last_hidden_state": enc}
