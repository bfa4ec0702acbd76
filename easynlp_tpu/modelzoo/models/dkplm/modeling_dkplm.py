"""TPU-native DKPLM (decomposable knowledge-enhanced pre-training).

Capability parity: reference easynlp/modelzoo/models/dkplm/modeling_dkplm.py
— a BERT whose input embeddings are augmented with projected KG entity
embeddings at entity positions (`insert_know_emb` + position mask, reference
:95-133, projection :1237) and whose pretraining loss adds a decode-knowledge
CE over `insert_know_labels` (reference appzoo/language_modeling/model.py
:68-88). KBERT and Kangaroo plug into the same injection seam (their
difference is data-side: KG-augmented attention trees / concept embeddings).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.models.bert import BertConfig
from easynlp_tpu.modelzoo.models.bert.modeling_bert import (
    BertEmbeddings,
    BertEncoder,
    BertMLMHead,
    BertPooler,
)
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.utils import losses


class DKPLMConfig(BertConfig):
    model_type = "dkplm"

    def __init__(self, knowledge_emb_size=200, **kwargs):
        self.knowledge_emb_size = knowledge_emb_size
        super().__init__(**kwargs)


class DKPLMModel(BaseModule):
    """BERT + additive projected knowledge embeddings at entity positions."""

    add_pooling_layer: bool = True
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, insert_know_emb=None,
                 insert_know_position_mask=None, deterministic=True):
        c = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

        hidden = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic)
        if insert_know_emb is not None:
            know = nn.Dense(
                c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.with_logical_partitioning(
                    truncated_normal_init(c.initializer_range),
                    (None, "embed")),
                bias_init=nn.with_logical_partitioning(
                    nn.initializers.zeros, ("embed",)),
                name="know_linear")(insert_know_emb.astype(self.dtype))
            if insert_know_position_mask is not None:
                know = know * insert_know_position_mask[..., None].astype(
                    self.dtype)
            hidden = hidden + know
        hidden, _, _ = BertEncoder(c, dtype=self.dtype, remat=self.remat,
                                   name="encoder")(
            hidden, attention_mask.astype(bool), deterministic)
        out = {"last_hidden_state": hidden}
        if self.add_pooling_layer:
            out["pooler_output"] = BertPooler(c, dtype=self.dtype,
                                              name="pooler")(hidden)
        return out


class DKPLMForPreTraining(BaseModule):
    remat: str = "none"

    def setup(self):
        self.bert = DKPLMModel(self.config, dtype=self.dtype,
                               add_pooling_layer=False, remat=self.remat)
        self.cls = BertMLMHead(self.config, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 insert_know_emb=None, insert_know_position_mask=None,
                 deterministic=True):
        out = self.bert(input_ids, attention_mask, token_type_ids,
                        insert_know_emb=insert_know_emb,
                        insert_know_position_mask=insert_know_position_mask,
                        deterministic=deterministic)
        shared = nn.unbox(self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"])
        out["logits"] = self.cls(out["last_hidden_state"], jnp.asarray(shared))
        return out


def dkplm_pretrain_loss(outputs, batch):
    """MLM CE + decode-knowledge CE (reference language_modeling/model.py
    :68-88)."""
    mlm = losses.cross_entropy(outputs["logits"], batch["label_ids"],
                               ignore_index=-100)
    total = mlm
    aux = {"mlm_loss": mlm}
    if "insert_know_labels" in batch:
        decode = losses.cross_entropy(outputs["logits"],
                                      batch["insert_know_labels"],
                                      ignore_index=-100)
        total = mlm + decode
        aux["decode_know_loss"] = decode
    return {"loss": total, **aux}
