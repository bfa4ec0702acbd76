"""TPU-native K-BERT.

Capability parity: reference easynlp/modelzoo/models/kbert/modeling_kbert.py
— KG triples are grafted into the token sequence as branches of a sentence
tree; a *visible matrix* [B, S, S] restricts attention so injected knowledge
only interacts with its anchor entity, and *soft position ids* place branch
tokens at their anchor's position. Model-side that means: BERT with (a)
caller-supplied position_ids and (b) a full attention bias built from the
visible matrix (tree construction is the dataset's job, as in the reference).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.models.bert import BertConfig
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
from easynlp_tpu.modelzoo.models.bert.modeling_bert import (
    ACT2FN,
    REMAT_POLICIES,
    BertEmbeddings,
    BertPooler,
    _dense,
    _layer_norm,
)
from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule
from easynlp_tpu.ops.attention import attention


class KBertConfig(BertConfig):
    model_type = "kbert"


class KBertLayer(nn.Module):
    """Post-LN BERT block with a full [B,1,S,S] additive attention bias
    (scan body: carry = (hidden, bias))."""

    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _=None):
        hidden, bias = carry
        c = self.config
        h = c.num_attention_heads
        d = c.hidden_size // h
        b, s, _e = hidden.shape
        qkv = _dense(3 * h * d, c, ("embed", "joined_kv"), dtype=self.dtype,
                     name="qkv")(hidden).reshape(b, s, 3, h, d)
        ctx = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias=bias)
        attn_out = _dense(c.hidden_size, c, ("joined_kv", "embed"),
                          dtype=self.dtype, name="attn_output")(
            ctx.reshape(b, s, h * d))
        attn_out = nn.Dropout(c.hidden_dropout_prob)(
            attn_out, deterministic=self.deterministic)
        hidden = _layer_norm(c, name="attention_ln")(
            hidden + attn_out).astype(self.dtype)
        mlp = _dense(c.intermediate_size, c, ("embed", "mlp"),
                     dtype=self.dtype, name="intermediate")(hidden)
        mlp = ACT2FN[c.hidden_act](mlp)
        mlp = _dense(c.hidden_size, c, ("mlp", "embed"), dtype=self.dtype,
                     name="output")(mlp)
        mlp = nn.Dropout(c.hidden_dropout_prob)(
            mlp, deterministic=self.deterministic)
        hidden = _layer_norm(c, name="output_ln")(
            hidden + mlp).astype(self.dtype)
        return (hidden, bias), None


class KBertModel(BaseModule):
    add_pooling_layer: bool = True
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, visible_matrix=None, deterministic=True):
        c = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if position_ids is None:  # soft positions come from the dataset
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

        hidden = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic)
        # bias from visible matrix ∧ padding mask
        visible = (visible_matrix.astype(bool)
                   if visible_matrix is not None
                   else jnp.ones((b, s, s), bool))
        visible = visible & attention_mask.astype(bool)[:, None, :]
        bias = jnp.where(visible[:, None], 0.0, -1e30)

        layer_cls = KBertLayer
        if self.remat in REMAT_POLICIES:
            layer_cls = nn.remat(layer_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        scan = nn.scan(layer_cls, variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=c.num_hidden_layers,
                       metadata_params={nn.PARTITION_NAME: "layers"},
                       unroll=scan_unroll(c, c.num_hidden_layers))
        (hidden, _), _ = scan(config=c, dtype=self.dtype,
                              deterministic=deterministic,
                              name="encoder_layers")((hidden, bias))
        out = {"last_hidden_state": hidden}
        if self.add_pooling_layer:
            out["pooler_output"] = BertPooler(c, dtype=self.dtype,
                                              name="pooler")(hidden)
        return out


def convert_kbert(state_dict, config):
    """K-BERT checkpoints are BERT-shaped; remap onto the KBertLayer names."""
    p = convert_bert_backbone(state_dict, config)
    layers = p.pop("encoder")["layers"]
    attn = layers.pop("attention")
    layers["qkv"] = attn["qkv"]
    layers["attn_output"] = attn["output"]
    p["encoder_layers"] = layers
    return p
