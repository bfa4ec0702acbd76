"""TPU-native BERT encoder.

Capability parity with the reference's vendored BERT (reference
easynlp/modelzoo/models/bert/modeling_bert.py: BertEmbeddings :72, BertLayer
:349, BertEncoder :432, BertPooler :529) — re-designed for XLA/TPU:

- layers are stacked with `nn.scan` (one traced layer, params carry a leading
  'layers' axis) instead of a Python list of modules → O(1) trace/compile
  regardless of depth, natural remat boundary;
- attention is the Pallas flash kernel (ops/attention.py) — no [B,H,S,S]
  probability tensor in HBM;
- QKV is one fused [E, 3·H·D] matmul feeding the MXU instead of three;
- params are fp32 with logical sharding axes (vocab/embed/heads/mlp) resolved
  by parallel/sharding.py; activations run in `dtype` (bf16 by default);
- LayerNorm runs in fp32 for stability and casts back.

Numerical parity targets (SURVEY.md §7.3): erf-gelu, LN eps from config,
post-LN residual order, truncated-normal(initializer_range) init.
"""

from typing import Any, Optional

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.modeling_utils import (BaseModule, scan_unroll,
                                                 truncated_normal_init)
from easynlp_tpu.ops.attention import attention

ACT2FN = {
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
    "relu": nn.relu,
    "swish": nn.swish,
    "silu": nn.silu,
    "tanh": nn.tanh,
}


def _dense(features, config, axes, name=None, use_bias=True, dtype=jnp.float32):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.with_logical_partitioning(
            truncated_normal_init(config.initializer_range), axes),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, (axes[-1],)),
        name=name,
    )


def _layer_norm(config, name=None):
    # fp32 LayerNorm regardless of compute dtype
    return nn.LayerNorm(
        epsilon=config.layer_norm_eps,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        scale_init=nn.with_logical_partitioning(nn.initializers.ones, ("embed",)),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, ("embed",)),
        name=name,
    )


class BertEmbeddings(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    use_layer_norm: bool = True  # MegatronBERT normalises in the first layer

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids, deterministic):
        c = self.config
        init = truncated_normal_init(c.initializer_range)
        word = nn.Embed(c.vocab_size, c.hidden_size, param_dtype=jnp.float32,
                        embedding_init=nn.with_logical_partitioning(
                            init, ("vocab", "embed")),
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       param_dtype=jnp.float32,
                       embedding_init=nn.with_logical_partitioning(
                           init, ("length", "embed")),
                       name="position_embeddings")(position_ids)
        emb = word + pos
        if c.type_vocab_size:
            tok = nn.Embed(c.type_vocab_size, c.hidden_size,
                           param_dtype=jnp.float32,
                           embedding_init=nn.with_logical_partitioning(
                               init, (None, "embed")),
                           name="token_type_embeddings")(token_type_ids)
            emb = emb + tok
        if self.use_layer_norm:
            emb = _layer_norm(c, name="LayerNorm")(emb)
        emb = nn.Dropout(c.hidden_dropout_prob)(emb, deterministic=deterministic)
        return emb.astype(self.dtype)


class BertAttention(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    output_scores: bool = False

    @nn.compact
    def __call__(self, hidden, kv_mask, deterministic):
        c = self.config
        h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        b, s, _ = hidden.shape
        qkv = _dense(3 * h * d, c, ("embed", "joined_kv"), dtype=self.dtype,
                     name="qkv")(hidden)
        qkv = checkpoint_name(qkv, "qkv_out")
        qkv = qkv.reshape(b, s, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = None
        if self.output_scores:
            # explicit scores path (attention-transfer distillation — the
            # flash kernel never materialises probabilities). Masked lanes
            # get -1e4 like the reference's extended_attention_mask so
            # MetaKD's "zero out <= -1e2" heuristic applies unchanged
            # (reference distill_metakd_application.py:279-287).
            scale = 1.0 / jnp.sqrt(jnp.float32(d))
            raw = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                             k.astype(jnp.float32)) * scale
            bias = jnp.where(kv_mask[:, None, None, :], 0.0, -1e4)
            scores = raw + bias
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v)
        else:
            # config.use_ring_attention=True shards the attention over the
            # mesh's `sequence` axis (SP long-context path; SURVEY.md §5.7)
            impl = "ring" if getattr(c, "use_ring_attention", False) \
                else "auto"
            ctx = attention(q, k, v, kv_mask=kv_mask, impl=impl)
        # named so remat policies can choose to save it instead of re-running
        # the flash kernel in the backward pass
        ctx = checkpoint_name(ctx, "attn_out")
        ctx = ctx.reshape(b, s, h * d)
        out = _dense(c.hidden_size, c, ("joined_kv", "embed"), dtype=self.dtype,
                     name="output")(ctx)
        out = checkpoint_name(out, "attn_proj_out")
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        if self.output_scores:
            return out, scores
        return out


class BertLayer(nn.Module):
    """One post-LN transformer block; written as a scan body:
    carry = (hidden, kv_mask)."""

    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True
    collect_hidden: bool = False
    collect_attn: bool = False
    pre_layer_norm: bool = False  # MegatronBERT layout

    @nn.compact
    def __call__(self, carry, _=None):
        hidden, kv_mask = carry
        c = self.config
        attn = BertAttention(c, dtype=self.dtype,
                             output_scores=self.collect_attn,
                             name="attention")
        scores = None
        if self.pre_layer_norm:
            normed = _layer_norm(c, name="attention_ln")(
                hidden).astype(self.dtype)
            attn_out = attn(normed, kv_mask, self.deterministic)
            if self.collect_attn:
                attn_out, scores = attn_out
            hidden = hidden + attn_out
            normed = _layer_norm(c, name="output_ln")(hidden).astype(self.dtype)
        else:
            attn_out = attn(hidden, kv_mask, self.deterministic)
            if self.collect_attn:
                attn_out, scores = attn_out
            hidden = _layer_norm(c, name="attention_ln")(
                hidden + attn_out).astype(self.dtype)
            normed = hidden

        mlp = _dense(c.intermediate_size, c, ("embed", "mlp"), dtype=self.dtype,
                     name="intermediate")(normed)
        mlp = checkpoint_name(mlp, "mlp_wi_out")
        mlp = ACT2FN[c.hidden_act](mlp)
        mlp = _dense(c.hidden_size, c, ("mlp", "embed"), dtype=self.dtype,
                     name="output")(mlp)
        mlp = checkpoint_name(mlp, "mlp_wo_out")
        mlp = nn.Dropout(c.hidden_dropout_prob)(
            mlp, deterministic=self.deterministic)
        if self.pre_layer_norm:
            hidden = hidden + mlp
        else:
            hidden = _layer_norm(c, name="output_ln")(
                hidden + mlp).astype(self.dtype)
        ys = hidden if self.collect_hidden else None
        if self.collect_attn:
            ys = (ys, scores)
        return (hidden, kv_mask), ys


REMAT_POLICIES = {
    # save MXU outputs + the attention context; recompute LayerNorm/gelu/
    # dropout in bwd — the standard TPU memory/speed point
    "selective": lambda: jax.checkpoint_policies.save_from_both_policies(
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        jax.checkpoint_policies.save_only_these_names("attn_out")),
    # save nothing per layer: minimum memory, ~30% step-time cost
    "full": lambda: jax.checkpoint_policies.nothing_saveable,
    # save only the tagged bf16 activations except the [*,S,4E] MLP
    # intermediate (recomputed from the saved qkv/attn tensors in bwd) —
    # dropping mlp_wi_out removes the biggest per-layer residual write AND
    # the DUS-fused slowdown of the wi matmul (v5e-measured: 1137 samples/s
    # vs 1110 with wi saved, vs 1037 with remat='none' at BERT-base b128)
    "names": lambda: jax.checkpoint_policies.save_only_these_names(
        "attn_out", "qkv_out", "attn_proj_out", "mlp_wo_out"),
}


class BertEncoder(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    remat: str = "none"
    output_hidden_states: bool = False
    output_attentions: bool = False
    pre_layer_norm: bool = False

    @nn.compact
    def __call__(self, hidden, kv_mask, deterministic):
        c = self.config
        layer_cls = BertLayer
        if self.remat in REMAT_POLICIES:
            layer_cls = nn.remat(layer_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        # Full unroll (config.scan_unroll >= num_layers) removes the XLA
        # while-loop and lets the scheduler fuse/overlap across layer
        # boundaries — v5e-measured +13% on BERT-base (1332 vs 1174
        # samples/s/chip) for one ~3min (cached thereafter) compile.
        # Partial unroll is a trap: unroll=2 measured *slower* than 1.
        scan = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=c.num_hidden_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
            unroll=scan_unroll(c, c.num_hidden_layers),
        )
        (hidden, _), ys = scan(
            config=c, dtype=self.dtype, deterministic=deterministic,
            collect_hidden=self.output_hidden_states,
            collect_attn=self.output_attentions,
            pre_layer_norm=self.pre_layer_norm,
            name="layers")((hidden, kv_mask))
        if self.output_attentions:
            all_hidden, all_scores = ys
        else:
            all_hidden, all_scores = ys, None
        if self.pre_layer_norm:
            hidden = _layer_norm(c, name="final_ln")(hidden).astype(self.dtype)
        # all_hidden: [L, B, S, E]; all_scores: [L, B, H, S, S]
        return hidden, all_hidden, all_scores


class BertPooler(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        first = hidden[:, 0]
        out = _dense(self.config.hidden_size, self.config, ("embed", "embed_out"),
                     dtype=self.dtype, name="dense")(first)
        return nn.tanh(out)


class BertModel(BaseModule):
    """Returns {'last_hidden_state': [B,S,E], 'pooler_output': [B,E]}."""

    add_pooling_layer: bool = True
    remat: str = "none"
    output_hidden_states: bool = False
    output_attentions: bool = False
    pre_layer_norm: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic=True):
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if position_ids is None:
            if getattr(self.config, "position_ids_from_padding_idx", False):
                # RoBERTa semantics (reference modeling_roberta.py
                # create_position_ids_from_input_ids): non-pad positions count
                # from padding_idx + 1; pad positions stay at padding_idx.
                pad = self.config.pad_token_id
                not_pad = (input_ids != pad).astype(jnp.int32)
                position_ids = jnp.cumsum(not_pad, axis=1) * not_pad + pad
            else:
                position_ids = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        kv_mask = attention_mask.astype(bool)

        hidden = BertEmbeddings(self.config, dtype=self.dtype,
                                use_layer_norm=not self.pre_layer_norm,
                                name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic)
        hidden, all_hidden, all_scores = BertEncoder(
            self.config, dtype=self.dtype, remat=self.remat,
            output_hidden_states=self.output_hidden_states,
            output_attentions=self.output_attentions,
            pre_layer_norm=self.pre_layer_norm,
            name="encoder")(hidden, kv_mask, deterministic)
        out = {"last_hidden_state": hidden}
        if self.output_hidden_states:
            out["hidden_states"] = all_hidden  # [L, B, S, E]
        if self.output_attentions:
            out["attentions"] = all_scores  # [L, B, H, S, S] masked scores
        if self.add_pooling_layer:
            out["pooler_output"] = BertPooler(self.config, dtype=self.dtype,
                                              name="pooler")(hidden)
        return out


class BertMLMHead(nn.Module):
    """Transform + tied-decoder MLM head (reference BertLMPredictionHead)."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, shared_embedding):
        c = self.config
        h = _dense(c.hidden_size, c, ("embed", "embed_out"), dtype=self.dtype,
                   name="transform")(hidden)
        h = ACT2FN[c.hidden_act](h)
        h = _layer_norm(c, name="transform_ln")(h).astype(self.dtype)
        # decoder tied to word embeddings: [B,S,E] @ [V,E]^T
        logits = jnp.einsum("bse,ve->bsv", h,
                            shared_embedding.astype(self.dtype))
        bias = self.param("bias",
                          nn.with_logical_partitioning(
                              nn.initializers.zeros, ("vocab",)),
                          (c.vocab_size,), jnp.float32)
        return logits + bias.astype(self.dtype)


class BertForMaskedLM(BaseModule):
    remat: str = "none"

    def setup(self):
        self.bert = BertModel(self.config, dtype=self.dtype,
                              add_pooling_layer=False, remat=self.remat)
        self.cls = BertMLMHead(self.config, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic=True):
        out = self.bert(input_ids, attention_mask, token_type_ids,
                        position_ids, deterministic)
        shared = self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"]
        shared = nn.unbox(shared)
        logits = self.cls(out["last_hidden_state"], shared)
        return {"logits": logits, **out}
