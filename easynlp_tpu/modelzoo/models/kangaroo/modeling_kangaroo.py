"""Kangaroo: dual-stream knowledge-enhanced BERT with entity-tree contrastive
samples and Poincaré concept embeddings.

Capability parity: reference easynlp/modelzoo/models/kangaroo/
modeling_kangaroo.py (2,221 LoC):
- dual text/entity streams — KangarooLayer (:537) runs attention on both, the
  FFN fuses them (KangarooIntermediate :401 adds the projected entity stream
  before the activation, KangarooOutput :430 splits back into both streams);
- KangarooLayerMix (:626) — text attention only, entity stream carried
  through the fused FFN; KangarooLayer_simple (:451) — plain BERT layer;
  the per-layer mix comes from config.layer_types (:722);
- contrastive sample encoding (:781-860): each entity's 1 positive +
  (sample_num-1) negative description sentences run through the first
  `sim` layers (SHARED weights with the text stream), CLS states project to
  ent_size, the positive fuses with the Poincaré concept embedding (:816);
- entity-stream init by scattering sample embeddings to token positions
  (:826-840 flatten+index_select — here a take_along_axis gather);
- MLM + entity contrast head (KangarooOnlyMLMHead :975: cosine similarity of
  projected token states against [positive; negatives], label 0 at entity
  tokens, -100 elsewhere).

TPU re-design: samples fold into the batch dimension for the shared layers
(one big MXU matmul instead of a python loop over slices with .data.copy_,
reference :778-781); the layer stack is unrolled (heterogeneous layer types
can't scan); text attention uses the shared flash-attention op.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert.modeling_bert import (
    ACT2FN,
    BertEmbeddings,
    BertMLMHead,
    BertPooler,
    _dense,
    _layer_norm,
)
from easynlp_tpu.ops.attention import attention


def _default_layer_types(n):
    third = n // 3
    types = ["sim"] * third + ["norm"] * third + ["mix"] * (n - 2 * third)
    return types[:n]


class KangarooConfig(PretrainedConfig):
    model_type = "kangaroo"

    def __init__(self, vocab_size=21128, hidden_size=768,
                 num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2,
                 initializer_range=0.02, layer_norm_eps=1e-12,
                 pad_token_id=0, ent_size=100, ent_heads=4, concept_size=10,
                 ent_num=3, sample_num=4, layer_types=None, **kwargs):
        self.ent_size = ent_size
        self.ent_heads = ent_heads
        self.concept_size = concept_size
        self.ent_num = ent_num
        self.sample_num = sample_num
        self.layer_types = list(layer_types) if layer_types is not None \
            else _default_layer_types(num_hidden_layers)
        super().__init__(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_hidden_layers,
            num_attention_heads=num_attention_heads,
            intermediate_size=intermediate_size, hidden_act=hidden_act,
            hidden_dropout_prob=hidden_dropout_prob,
            attention_probs_dropout_prob=attention_probs_dropout_prob,
            max_position_embeddings=max_position_embeddings,
            type_vocab_size=type_vocab_size,
            initializer_range=initializer_range,
            layer_norm_eps=layer_norm_eps, pad_token_id=pad_token_id,
            **kwargs)


class _SelfAttention(nn.Module):
    """Post-LN self-attention block over an arbitrary width (text stream uses
    the flash op; the 100-dim entity stream takes the same path — the op
    routes small shapes to the exact XLA kernel)."""

    config: Any
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv_mask, deterministic):
        c = self.config
        h = self.heads
        d = self.width // h
        b, s, _ = hidden.shape
        qkv = _dense(3 * h * d, c, ("embed", "joined_kv"), dtype=self.dtype,
                     name="qkv")(hidden)
        qkv = qkv.reshape(b, s, 3, h, d)
        ctx = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                        kv_mask=kv_mask)
        out = _dense(self.width, c, ("joined_kv", "embed"), dtype=self.dtype,
                     name="output")(ctx.reshape(b, s, h * d))
        out = nn.Dropout(c.hidden_dropout_prob)(out,
                                                deterministic=deterministic)
        out = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="ln")(
            hidden + out).astype(self.dtype)
        return out


class KangarooLayer(nn.Module):
    """One Kangaroo layer; `layer_type` picks the reference variant."""

    config: Any
    layer_type: str  # "sim" | "norm" | "mix"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv_mask, hidden_ent, ent_kv_mask, ent_mask,
                 deterministic):
        c = self.config
        attn = _SelfAttention(c, c.hidden_size, c.num_attention_heads,
                              dtype=self.dtype, name="attention")
        attn_out = attn(hidden, kv_mask, deterministic)

        if self.layer_type == "sim":
            # plain BERT FFN; entity stream passes through (reference :451)
            mlp = _dense(c.intermediate_size, c, ("embed", "mlp"),
                         dtype=self.dtype, name="intermediate")(attn_out)
            mlp = ACT2FN[c.hidden_act](mlp)
            mlp = _dense(c.hidden_size, c, ("mlp", "embed"),
                         dtype=self.dtype, name="output")(mlp)
            mlp = nn.Dropout(c.hidden_dropout_prob)(
                mlp, deterministic=deterministic)
            hidden = nn.LayerNorm(
                epsilon=c.layer_norm_eps, dtype=jnp.float32,
                param_dtype=jnp.float32, name="output_ln")(
                attn_out + mlp).astype(self.dtype)
            return hidden, hidden_ent

        if self.layer_type == "norm":
            # entity stream gets its own (small) attention (reference :318)
            ent_attn = _SelfAttention(c, c.ent_size, c.ent_heads,
                                      dtype=self.dtype, name="attention_ent")
            attn_ent = ent_attn(hidden_ent, ent_kv_mask, deterministic)
            attn_ent = attn_ent * ent_mask[..., None].astype(attn_ent.dtype)
        else:  # "mix": text attention only, masked passthrough (:626)
            attn_ent = hidden_ent * ent_mask[..., None].astype(
                hidden_ent.dtype)

        # fused FFN (reference KangarooIntermediate :401 + KangarooOutput
        # :430): intermediate adds the projected entity stream pre-activation
        inter = _dense(c.intermediate_size, c, ("embed", "mlp"),
                       dtype=self.dtype, name="intermediate")(attn_out)
        inter_ent = _dense(c.intermediate_size, c, (None, "mlp"),
                           dtype=self.dtype, name="intermediate_ent")(
            attn_ent)
        inter = ACT2FN[c.hidden_act](inter + inter_ent)

        out = _dense(c.hidden_size, c, ("mlp", "embed"), dtype=self.dtype,
                     name="output")(inter)
        out = nn.Dropout(c.hidden_dropout_prob)(out,
                                                deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="output_ln")(
            attn_out + out).astype(self.dtype)

        out_ent = _dense(c.ent_size, c, ("mlp", None), dtype=self.dtype,
                         name="output_ent")(inter)
        out_ent = nn.Dropout(c.hidden_dropout_prob)(
            out_ent, deterministic=deterministic)
        hidden_ent = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                                  param_dtype=jnp.float32,
                                  name="output_ln_ent")(
            attn_ent + out_ent).astype(self.dtype)
        return hidden, hidden_ent


class KangarooModel(BaseModule):
    """Returns last_hidden_state, pooler_output, positive/negative entity
    streams (reference KangarooModel.forward :1209-1390)."""

    add_pooling_layer: bool = True
    remat: str = "none"

    def setup(self):
        c = self.config
        self.embeddings = BertEmbeddings(c, dtype=self.dtype)
        self.layers = [
            KangarooLayer(c, layer_type=t, dtype=self.dtype,
                          name="layer_%d" % i)
            for i, t in enumerate(c.layer_types)]
        # first contiguous run of "sim" layers encodes the samples (:778)
        n = 0
        for t in c.layer_types:
            if t != "sim":
                break
            n += 1
        self.sample_layers = n
        self.linear = nn.Dense(
            c.ent_size, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(c.initializer_range),
                ("embed", None)), name="linear")
        self.linear2 = nn.Dense(
            c.ent_size, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(c.initializer_range),
                (None, None)), name="linear2")
        if self.add_pooling_layer:
            self.pooler = BertPooler(c, dtype=self.dtype)

    def encode_samples(self, sample_token_id, sample_position_id,
                       sample_mask, deterministic):
        """[B, ent_num*sample_num, Ss] → CLS states [B, ent_num, sample_num,
        H] through the shared first `sim` layers — folded into one batch."""
        b = sample_token_id.shape[0]
        ss = sample_token_id.shape[-1]
        ids = sample_token_id.reshape(-1, ss)
        pos = sample_position_id.reshape(-1, ss) \
            if sample_position_id is not None else \
            jnp.broadcast_to(jnp.arange(ss)[None], ids.shape)
        mask = sample_mask.reshape(-1, ss) if sample_mask is not None \
            else (ids != self.config.pad_token_id).astype(jnp.int32)
        emb = self.embeddings(ids, jnp.zeros_like(ids), pos, deterministic)
        kv = mask.astype(bool)
        for layer in self.layers[:self.sample_layers]:
            emb, _ = layer(emb, kv, None, None, None, deterministic)
        cls = emb[:, 0, :]
        c = self.config
        return cls.reshape(b, c.ent_num, c.sample_num, -1)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, entities_position=None, ent_mask=None,
                 sample_token_id=None, sample_position_id=None,
                 sample_mask=None, concept_emb=None, deterministic=True):
        c = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        kv_mask = attention_mask.astype(bool)
        hidden = self.embeddings(input_ids, token_type_ids, position_ids,
                                 deterministic)

        positive_ent = negative_ent = None
        hidden_ent = jnp.zeros((b, s, c.ent_size), self.dtype)
        if ent_mask is None:
            ent_mask = jnp.zeros((b, s), jnp.int32)
        # entity attention sees only entity positions (reference
        # extended_ent_mask :1313); fully-masked rows are harmless — the
        # output is re-masked by ent_mask after every layer
        ent_kv_mask = ent_mask.astype(bool)

        if sample_token_id is not None:
            cls = self.encode_samples(sample_token_id, sample_position_id,
                                      sample_mask, deterministic)
            pos_emb = self.linear(cls[:, :, 0, :].astype(jnp.float32))
            if concept_emb is not None:
                pos_emb = self.linear2(
                    jnp.concatenate(
                        [pos_emb, concept_emb.astype(jnp.float32)], -1))
            # prepend a zero row: entities_position==0 means "no entity"
            zero = jnp.zeros((b, 1, c.ent_size), pos_emb.dtype)
            pos_table = jnp.concatenate([zero, pos_emb], axis=1)
            hidden_ent = jnp.take_along_axis(
                pos_table, entities_position[..., None], axis=1
            ).astype(self.dtype)                       # [B, S, E]
            positive_ent = hidden_ent
            if c.sample_num > 1:
                neg_emb = self.linear(cls[:, :, 1:, :].astype(jnp.float32))
                zero_n = jnp.zeros((b, 1, c.sample_num - 1, c.ent_size),
                                   neg_emb.dtype)
                neg_table = jnp.concatenate([zero_n, neg_emb], axis=1)
                negative_ent = jnp.take_along_axis(
                    neg_table, entities_position[..., None, None], axis=1)

        for layer in self.layers:
            hidden, hidden_ent = layer(hidden, kv_mask, hidden_ent,
                                       ent_kv_mask, ent_mask, deterministic)

        out = {"last_hidden_state": hidden}
        if positive_ent is not None:
            out["positive_ent"] = positive_ent
            out["negative_ent"] = negative_ent
        if self.add_pooling_layer:
            out["pooler_output"] = self.pooler(hidden)
        return out


class KangarooForPreTraining(BaseModule):
    """MLM + entity contrast (reference KangarooForMaskedLM :1611-1732 with
    KangarooOnlyMLMHead :975)."""

    remat: str = "none"

    def setup(self):
        c = self.config
        self.kangaroo = KangarooModel(config=c, dtype=self.dtype,
                                      add_pooling_layer=False)
        self.mlm_head = BertMLMHead(c, dtype=self.dtype)
        self.token_emb = nn.Dense(
            c.ent_size, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(c.initializer_range), ("embed", None)),
            name="token_emb")

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 entities_position=None, ent_mask=None, sample_token_id=None,
                 sample_position_id=None, sample_mask=None, concept_emb=None,
                 deterministic=True):
        out = self.kangaroo(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            entities_position=entities_position, ent_mask=ent_mask,
            sample_token_id=sample_token_id,
            sample_position_id=sample_position_id, sample_mask=sample_mask,
            concept_emb=concept_emb, deterministic=deterministic)
        shared = self.kangaroo.embeddings.variables[
            "params"]["word_embeddings"]["embedding"]
        logits = self.mlm_head(out["last_hidden_state"], nn.unbox(shared))
        result = {"logits": logits,
                  "last_hidden_state": out["last_hidden_state"]}
        if "positive_ent" in out and out.get("negative_ent") is not None:
            tok = self.token_emb(
                out["last_hidden_state"].astype(jnp.float32))  # [B,S,E]
            pos_neg = jnp.concatenate(
                [out["positive_ent"][:, :, None, :].astype(jnp.float32),
                 out["negative_ent"].astype(jnp.float32)], axis=2)
            # cosine similarity token vs each sample: [B, S, sample_num]
            tn = tok / (jnp.linalg.norm(tok, axis=-1, keepdims=True) + 1e-8)
            pn = pos_neg / (jnp.linalg.norm(pos_neg, axis=-1,
                                            keepdims=True) + 1e-8)
            result["cos_score"] = jnp.einsum("bse,bske->bsk", tn, pn)
            # label 0 (the positive) at entity tokens, ignore elsewhere
            result["sample_label"] = jnp.where(ent_mask != 0, 0, -100)
        return result


def convert_kangaroo(state_dict, config):
    """Reference Kangaroo torch checkpoint → this layout (unrolled layers,
    fused QKV). Handles the reference names kangaroo.embeddings.*,
    kangaroo.encoder.layer.{i}.attention.{self,self_ent,output,output_ent},
    .intermediate.dense{,_ent}, .output.{dense,dense_ent,LayerNorm{,_ent}},
    kangaroo.encoder.linear{,2}, cls.predictions, cls.token_emb."""
    import numpy as np

    from easynlp_tpu.modelzoo.models.bert.conversion import (_dense_t, _ln,
                                                             _norm_keys)
    s = {}
    for k, v in state_dict.items():
        k = k[9:] if k.startswith("kangaroo.") else k
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        s[k] = np.asarray(v)

    def fused_qkv(base):
        kernel = np.concatenate(
            [s[base + n + ".weight"].T for n in ("query", "key", "value")],
            axis=1)
        bias = np.concatenate(
            [s[base + n + ".bias"] for n in ("query", "key", "value")])
        return {"kernel": kernel, "bias": bias}

    kang = {"embeddings": {
        "word_embeddings": {
            "embedding": s["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": s["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": s["embeddings.token_type_embeddings.weight"]},
        "LayerNorm": _ln(s, "embeddings.LayerNorm"),
    }}
    for i, t in enumerate(config.layer_types):
        base = "encoder.layer.%d." % i
        layer = {"attention": {
            "qkv": fused_qkv(base + "attention.self."),
            "output": _dense_t(s, base + "attention.output.dense"),
            "ln": _ln(s, base + "attention.output.LayerNorm"),
        }}
        if t == "norm" and base + "attention.self_ent.query.weight" in s:
            layer["attention_ent"] = {
                "qkv": fused_qkv(base + "attention.self_ent."),
                "output": _dense_t(s, base + "attention.output_ent.dense"),
                "ln": _ln(s, base + "attention.output_ent.LayerNorm"),
            }
        layer["intermediate"] = _dense_t(s, base + "intermediate.dense")
        layer["output"] = _dense_t(s, base + "output.dense")
        if t == "sim":
            layer["output_ln"] = _ln(s, base + "output.LayerNorm")
        else:
            layer["intermediate_ent"] = _dense_t(
                s, base + "intermediate.dense_ent")
            layer["output_ent"] = _dense_t(s, base + "output.dense_ent")
            layer["output_ln"] = _ln(s, base + "output.LayerNorm")
            layer["output_ln_ent"] = _ln(s, base + "output.LayerNorm_ent")
        kang["layer_%d" % i] = layer
    for name, key in (("linear", "encoder.linear"),
                      ("linear2", "encoder.linear2")):
        if key + ".weight" in s:
            kang[name] = _dense_t(s, key)
    params = {"kangaroo": kang}
    if "cls.predictions.transform.dense.weight" in s:
        params["mlm_head"] = {
            "transform": _dense_t(s, "cls.predictions.transform.dense"),
            "transform_ln": _ln(s, "cls.predictions.transform.LayerNorm"),
            "bias": s["cls.predictions.bias"],
        }
    if "cls.token_emb.weight" in s:
        params["token_emb"] = _dense_t(s, "cls.token_emb")
    return params
