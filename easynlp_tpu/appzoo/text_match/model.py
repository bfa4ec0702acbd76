"""Text match applications.

Capability parity: reference easynlp/appzoo/text_match/model.py —
single-tower cross-encoder w/ CE (:27-74) and two-tower bi-encoder with
CLS/avg embeddings under hinge or circle loss (:163-259, V1 :77-160).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.appzoo.sequence_classification.model import (
    SequenceClassification,
)
from easynlp_tpu.modelzoo.modeling_utils import BaseModule
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
from easynlp_tpu.utils import losses


class TextMatch(SequenceClassification):
    """Cross-encoder: sentence pair through one BERT + classify (match/no)."""


class TwoTowerModule(BaseModule):
    """Shared-backbone bi-encoder producing L2-normalised embeddings."""

    pooling: str = "cls"  # cls | avg
    remat: str = "none"

    def setup(self):
        self.backbone = BertModel(self.config, dtype=self.dtype,
                                  add_pooling_layer=False, remat=self.remat)

    def encode(self, input_ids, attention_mask=None, token_type_ids=None,
               deterministic=True):
        out = self.backbone(input_ids, attention_mask=attention_mask,
                            token_type_ids=token_type_ids,
                            deterministic=deterministic)
        hidden = out["last_hidden_state"].astype(jnp.float32)
        if self.pooling == "avg":
            mask = (attention_mask if attention_mask is not None
                    else jnp.ones(input_ids.shape, jnp.int32))
            mask = mask.astype(jnp.float32)[..., None]
            emb = jnp.sum(hidden * mask, 1) / jnp.maximum(mask.sum(1), 1.0)
        else:
            emb = hidden[:, 0]
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 input_ids_b=None, attention_mask_b=None, token_type_ids_b=None,
                 deterministic=True):
        emb_a = self.encode(input_ids, attention_mask, token_type_ids,
                            deterministic)
        out = {"embeddings": emb_a}
        if input_ids_b is not None:
            emb_b = self.encode(input_ids_b, attention_mask_b, token_type_ids_b,
                                deterministic)
            out["embeddings_b"] = emb_b
            out["similarity"] = jnp.sum(emb_a * emb_b, axis=-1)
            # in-batch similarity matrix for circle/contrastive losses
            out["sim_matrix"] = emb_a @ emb_b.T
            out["logits"] = jnp.stack(
                [-out["similarity"], out["similarity"]], axis=-1)
            out["predictions"] = (out["similarity"] > 0.5).astype(jnp.int32)
            out["probabilities"] = nn.softmax(out["logits"], axis=-1)
        return out


class TextMatchTwoTower(Application):
    model_input_keys = ("input_ids", "attention_mask", "token_type_ids",
                        "input_ids_b", "attention_mask_b", "token_type_ids_b")

    loss_type = "hinge_loss"
    margin = 0.3
    gamma = 32.0

    @staticmethod
    def loss_fn(outputs, batch):
        """hinge (in-batch negatives) or circle loss over the similarity
        matrix (reference model.py:163-259)."""
        sim = outputs["sim_matrix"].astype(jnp.float32)
        n = sim.shape[0]
        labels = jnp.eye(n)
        pos = jnp.diagonal(sim)
        # hinge with in-batch negatives: max(0, margin - pos_i + neg_ij)
        neg_mask = 1.0 - labels
        hinge = jnp.maximum(0.0, 0.3 - pos[:, None] + sim) * neg_mask
        loss = jnp.sum(hinge) / jnp.maximum(jnp.sum(neg_mask), 1.0)
        return {"loss": loss}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        udp = getattr(args, "user_defined_parameters_dict", {}) if args else {}
        pooling = udp.get("two_tower_pooling", "cls")
        remat = getattr(args, "remat", "none") if args else "none"
        return TwoTowerModule(config=config, dtype=dtype, pooling=pooling,
                              remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        backbone = convert_bert_backbone(state_dict, config)
        backbone.pop("pooler", None)
        return {"backbone": backbone}


class TextMatchTwoTowerCircleLoss(TextMatchTwoTower):
    @staticmethod
    def loss_fn(outputs, batch):
        sim = outputs["sim_matrix"]
        n = sim.shape[0]
        return {"loss": losses.circle_loss(sim, jnp.eye(n))}
