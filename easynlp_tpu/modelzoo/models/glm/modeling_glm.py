"""TPU-native GLM (General Language Model, block-infilling).

Capability parity: reference easynlp/modelzoo/models/glm/modeling_glm.py
(HF-style GLM incl. GLMForConditionalGeneration :843) and the model-parallel
variant easynlp/modelzoo/models/mg_glm/mpu_transformer.py — on TPU the two
are ONE implementation: the mpu Column/RowParallelLinear layers become
logical-axis annotations ('joined_kv'/'mlp' → the 'tensor' mesh axis), the
vocab-parallel CE lives in ops/fused_ce.py, and fp16 loss-scaling machinery
(mg_utils/fp16.py) is unnecessary in bf16.

GLM specifics: GPT-2-style pre-LN blocks; block-infilling attention — a
bidirectional prefix (Part A) followed by autoregressive spans (Part B) —
expressed as per-sample prefix lengths; 2D position encoding (absolute
position + within-span position), both learned.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert.modeling_bert import ACT2FN, REMAT_POLICIES
from easynlp_tpu.ops.attention import attention


class GLMConfig(PretrainedConfig):
    model_type = "glm"

    def __init__(self, vocab_size=50048, hidden_size=1024, num_layers=24,
                 num_attention_heads=16, max_sequence_length=512,
                 max_memory_length=0, embedding_dropout_prob=0.1,
                 attention_dropout_prob=0.1, output_dropout_prob=0.1,
                 layernorm_epsilon=1e-5, block_position_encoding=True,
                 initializer_range=0.02, **kwargs):
        self.num_layers = num_layers
        self.max_sequence_length = max_sequence_length
        self.max_memory_length = max_memory_length
        self.embedding_dropout_prob = embedding_dropout_prob
        self.attention_dropout_prob = attention_dropout_prob
        self.output_dropout_prob = output_dropout_prob
        self.layernorm_epsilon = layernorm_epsilon
        self.block_position_encoding = block_position_encoding
        kwargs.setdefault("num_hidden_layers", num_layers)
        kwargs.setdefault("hidden_dropout_prob", output_dropout_prob)
        kwargs.setdefault("is_decoder", True)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         num_attention_heads=num_attention_heads,
                         initializer_range=initializer_range, **kwargs)


def _dense(features, config, axes, name=None, dtype=jnp.float32):
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=nn.with_logical_partitioning(
                        truncated_normal_init(config.initializer_range), axes),
                    bias_init=nn.with_logical_partitioning(
                        nn.initializers.zeros, (axes[-1],)),
                    name=name)


def _ln(config, name=None):
    return nn.LayerNorm(epsilon=config.layernorm_epsilon, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        scale_init=nn.with_logical_partitioning(
                            nn.initializers.ones, ("embed",)),
                        bias_init=nn.with_logical_partitioning(
                            nn.initializers.zeros, ("embed",)),
                        name=name)


class GLMBlock(nn.Module):
    """Pre-LN block; carry = (hidden, attn_bias, cache_index, stacked
    (k, v) decode caches or None), xs = (layer index, {"mem": [B, M, E]}
    Transformer-XL segment memories or None). The decode cache rides the
    CARRY and is written in place at (layer_idx, :, cache_index) — see
    modeling_gpt2.py's copy-free-decode note; the read-only mems stay
    scan xs (their per-layer h_in ys is a genuine output)."""

    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, xs=None):
        hidden, bias, cache_index, layer_cache = carry
        layer_idx, extra = xs
        mem = extra.get("mem") if isinstance(extra, dict) else None
        c = self.config
        h = c.num_attention_heads
        d = c.hidden_size // h
        b, s, _e = hidden.shape
        in_ln = _ln(c, name="input_layernorm")
        normed = in_ln(hidden).astype(self.dtype)
        qkv_dense = _dense(3 * h * d, c, ("embed", "joined_kv"),
                           dtype=self.dtype, name="qkv")
        if mem is not None:
            # Transformer-XL memories (reference mpu_transformer.py:77-78,
            # 264-270): the PREVIOUS segments' layer-input hiddens pass
            # through this layer's input LN and the shared qkv projection;
            # queries cover only the current segment, K/V cover [mem; cur]
            m_len = mem.shape[1]
            cat = jnp.concatenate(
                [in_ln(mem).astype(self.dtype), normed], axis=1)
            qkv = qkv_dense(cat).reshape(b, m_len + s, 3, h, d)
            q, k, v = qkv[:, -s:, 0], qkv[:, :, 1], qkv[:, :, 2]
            ctx = attention(q, k, v, bias=bias)  # bias [B, 1, S, M+S]
            # ys carries this layer's INPUT hidden — the next segment's mem
            new_cache = {"h_in": hidden}
        else:
            qkv = qkv_dense(normed).reshape(b, s, 3, h, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if layer_cache is None:
                ctx = attention(q, k, v, bias=bias)
                new_cache = None
            else:
                k_full, v_full = layer_cache
                k_full = jax.lax.dynamic_update_slice(
                    k_full, k.astype(k_full.dtype)[None],
                    (layer_idx, 0, cache_index, 0, 0))
                v_full = jax.lax.dynamic_update_slice(
                    v_full, v.astype(v_full.dtype)[None],
                    (layer_idx, 0, cache_index, 0, 0))
                k_read = jax.lax.dynamic_index_in_dim(
                    k_full, layer_idx, 0, False)
                v_read = jax.lax.dynamic_index_in_dim(
                    v_full, layer_idx, 0, False)
                # bias here is [B, 1, S_q, T_cache] over the full cache
                # buffer
                ctx = attention(q, k_read, v_read, bias=bias)
                layer_cache = (k_full, v_full)
        attn_out = _dense(c.hidden_size, c, ("joined_kv", "embed"),
                          dtype=self.dtype, name="dense")(
            ctx.reshape(b, s, h * d))
        attn_out = nn.Dropout(c.output_dropout_prob)(
            attn_out, deterministic=self.deterministic)
        hidden = hidden + attn_out

        normed = _ln(c, name="post_attention_layernorm")(
            hidden).astype(self.dtype)
        mlp = _dense(4 * c.hidden_size, c, ("embed", "mlp"),
                     dtype=self.dtype, name="dense_h_to_4h")(normed)
        mlp = ACT2FN["gelu_new"](mlp)
        mlp = _dense(c.hidden_size, c, ("mlp", "embed"), dtype=self.dtype,
                     name="dense_4h_to_h")(mlp)
        mlp = nn.Dropout(c.output_dropout_prob)(
            mlp, deterministic=self.deterministic)
        ys = new_cache if mem is not None else None
        return (hidden + mlp, bias, cache_index, layer_cache), ys


def glm_attention_bias(prefix_lengths, seq_len):
    """Block-infilling mask: position j is visible from i iff j < prefix_len
    (bidirectional Part A) or j <= i (causal Part B). Returns additive bias
    [B, 1, S, S]."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    causal = j <= i
    bidir = j[None] < prefix_lengths[:, None, None]
    visible = causal[None] | bidir
    return jnp.where(visible[:, None], 0.0, -1e30)


class GLMModel(BaseModule):
    remat: str = "none"

    def init_cache(self, batch_size, max_length, dtype=None):
        c = self.config
        h = c.num_attention_heads
        d = c.hidden_size // h
        dtype = dtype or self.dtype
        return {
            "k": jnp.zeros((c.num_layers, batch_size, max_length, h, d),
                           dtype),
            "v": jnp.zeros((c.num_layers, batch_size, max_length, h, d),
                           dtype),
            "index": jnp.zeros((), jnp.int32),
            "mask": jnp.zeros((batch_size, max_length), jnp.int32),
        }

    def init_mems(self, batch_size, mem_length=None, dtype=None):
        """Empty Transformer-XL segment memories: per-layer INPUT hiddens of
        prior segments (reference mpu_transformer.py:799-867) with a
        validity mask — static [L, B, M, E] shapes so segments stream
        through one compiled program."""
        c = self.config
        m = int(mem_length if mem_length is not None
                else c.max_memory_length)
        return {
            "h": jnp.zeros((c.num_layers, batch_size, m, c.hidden_size),
                           dtype or self.dtype),
            "mask": jnp.zeros((batch_size, m), jnp.int32),
        }

    @nn.compact
    def __call__(self, input_ids, position_ids=None, block_position_ids=None,
                 prefix_lengths=None, attention_mask=None, cache=None,
                 mems=None, deterministic=True):
        c = self.config
        b, s = input_ids.shape
        init = truncated_normal_init(c.initializer_range)
        word = nn.Embed(c.vocab_size, c.hidden_size, param_dtype=jnp.float32,
                        embedding_init=nn.with_logical_partitioning(
                            init, ("vocab", "embed")),
                        name="word_embeddings")(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        pos = nn.Embed(c.max_sequence_length + 1, c.hidden_size,
                       param_dtype=jnp.float32,
                       embedding_init=nn.with_logical_partitioning(
                           init, ("length", "embed")),
                       name="position_embeddings")(position_ids)
        hidden = word + pos
        if c.block_position_encoding:
            if block_position_ids is None:
                block_position_ids = jnp.zeros((b, s), jnp.int32)
            bpos = nn.Embed(c.max_sequence_length + 1, c.hidden_size,
                            param_dtype=jnp.float32,
                            embedding_init=nn.with_logical_partitioning(
                                init, ("length", "embed")),
                            name="block_position_embeddings")(
                block_position_ids)
            hidden = hidden + bpos
        hidden = nn.Dropout(c.embedding_dropout_prob)(
            hidden, deterministic=deterministic).astype(self.dtype)

        if prefix_lengths is None:
            prefix_lengths = jnp.zeros((b,), jnp.int32)  # fully causal
        if cache is None:
            bias = glm_attention_bias(prefix_lengths, s)
            if attention_mask is not None:
                bias = jnp.where(
                    attention_mask[:, None, None, :].astype(bool),
                    bias, -1e30)
            xs = None
            cache_index = jnp.zeros((), jnp.int32)
            if mems is not None:
                # memory key columns are fully visible wherever valid
                # (reference build_mask_matrix prepends ones over
                # memory_length, mpu_transformer.py:769-772)
                m_len = mems["h"].shape[2]
                mem_bias = jnp.where(
                    mems["mask"][:, None, None, :].astype(bool), 0.0, -1e30)
                bias = jnp.concatenate(
                    [jnp.broadcast_to(mem_bias, (b, 1, s, m_len)), bias],
                    axis=-1)
                xs = {"mem": mems["h"].astype(self.dtype)}
        else:
            # bias over the full cache buffer: a key slot is visible if it
            # has been written (cache mask) and sits in the bidirectional
            # prefix or at/before the query's global position
            t = cache["k"].shape[2]
            cache_index = cache["index"]
            q_pos = cache_index + jnp.arange(s)              # [S]
            k_pos = jnp.arange(t)                            # [T]
            visible = (k_pos[None, :] < prefix_lengths[:, None, None]) | \
                (k_pos[None, None, :] <= q_pos[None, :, None])
            visible = visible & cache["mask"][:, None, :].astype(bool)
            bias = jnp.where(visible[:, None], 0.0, -1e30)
            xs = None

        block_cls = GLMBlock
        if self.remat in REMAT_POLICIES:
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        scan = nn.scan(block_cls, variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=c.num_layers,
                       metadata_params={nn.PARTITION_NAME: "layers"},
                       unroll=scan_unroll(c, c.num_layers))
        caches = (cache["k"], cache["v"]) if cache is not None else None
        extra = xs if isinstance(xs, dict) else None
        (hidden, _, _, new_caches), ys = scan(config=c, dtype=self.dtype,
                                              deterministic=deterministic,
                                              name="layers")(
            (hidden, bias, cache_index, caches),
            (jnp.arange(c.num_layers), extra))
        hidden = _ln(c, name="final_layernorm")(hidden).astype(self.dtype)
        out = {"last_hidden_state": hidden}
        if cache is not None:
            out["cache"] = {"k": new_caches[0], "v": new_caches[1],
                            "index": cache_index + s, "mask": cache["mask"]}
        if mems is not None:
            # slide the window: keep the last M of [old mems; this segment's
            # layer inputs] (reference update_mems, mpu_transformer.py:
            # 854-867) — static shapes, so one compiled program per stream
            m_len = mems["h"].shape[2]
            seg_mask = attention_mask.astype(jnp.int32) if attention_mask \
                is not None else jnp.ones((b, s), jnp.int32)
            out["mems"] = {
                "h": jnp.concatenate(
                    [mems["h"], ys["h_in"].astype(mems["h"].dtype)],
                    axis=2)[:, :, -m_len:] if m_len else mems["h"],
                "mask": jnp.concatenate(
                    [mems["mask"], seg_mask], axis=-1)[:, -m_len:]
                if m_len else mems["mask"],
            }
        return out


class GLMForConditionalGeneration(BaseModule):
    """GLM with tied LM head (reference modeling_glm.py:843)."""

    remat: str = "none"

    def setup(self):
        self.glm = GLMModel(self.config, dtype=self.dtype, remat=self.remat)

    def init_cache(self, batch_size, max_length, dtype=None):
        c = self.config
        h = c.num_attention_heads
        d = c.hidden_size // h
        dtype = dtype or self.dtype
        return {
            "k": jnp.zeros((c.num_layers, batch_size, max_length, h, d),
                           dtype),
            "v": jnp.zeros((c.num_layers, batch_size, max_length, h, d),
                           dtype),
            "index": jnp.zeros((), jnp.int32),
            "mask": jnp.zeros((batch_size, max_length), jnp.int32),
        }

    def init_mems(self, batch_size, mem_length=None, dtype=None):
        # standalone (usable before setup/apply), mirrors GLMModel.init_mems
        c = self.config
        m = int(mem_length if mem_length is not None
                else c.max_memory_length)
        return {
            "h": jnp.zeros((c.num_layers, batch_size, m, c.hidden_size),
                           dtype or self.dtype),
            "mask": jnp.zeros((batch_size, m), jnp.int32),
        }

    def __call__(self, input_ids, position_ids=None, block_position_ids=None,
                 prefix_lengths=None, attention_mask=None, cache=None,
                 mems=None, deterministic=True):
        out = self.glm(input_ids, position_ids, block_position_ids,
                       prefix_lengths, attention_mask, cache, mems,
                       deterministic)
        wte = nn.unbox(
            self.glm.variables["params"]["word_embeddings"]["embedding"])
        logits = jnp.einsum("bse,ve->bsv", out["last_hidden_state"],
                            jnp.asarray(wte).astype(self.dtype))
        out["logits"] = logits
        return out
