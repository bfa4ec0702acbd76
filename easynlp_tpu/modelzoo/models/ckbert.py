"""CKBERT: contrastive knowledge-enhanced MLM pretraining.

Capability parity: reference CKBERT branch — external-knowledge masking +
SimCSE-style contrastive learning alongside MLM (reference
appzoo/language_modeling/data.py:65-69; trainer hook core/trainer.py:42-43,
629-667; loss model.py:68-88). The knowledge-guided masking is the dataset's
job (LanguageModelingDataset with entity-aware masks); this module supplies
the two-view contrastive forward: the backbone runs twice inside one apply —
flax hands each nn.Dropout call fresh bits, so the two views are independent
dropout samples exactly like SimCSE."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.modeling_utils import BaseModule
from easynlp_tpu.modelzoo.models.bert import BertConfig
from easynlp_tpu.modelzoo.models.bert.modeling_bert import BertMLMHead, BertModel
from easynlp_tpu.utils import losses


class CKBertConfig(BertConfig):
    model_type = "ckbert"

    def __init__(self, contrastive_temperature=0.05, contrastive_weight=0.1,
                 **kwargs):
        self.contrastive_temperature = contrastive_temperature
        self.contrastive_weight = contrastive_weight
        super().__init__(**kwargs)


class CKBertForPreTraining(BaseModule):
    remat: str = "none"

    def setup(self):
        self.bert = BertModel(self.config, dtype=self.dtype,
                              add_pooling_layer=False, remat=self.remat)
        self.cls = BertMLMHead(self.config, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        out = self.bert(input_ids, attention_mask, token_type_ids,
                        deterministic=deterministic)
        shared = nn.unbox(self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"])
        logits = self.cls(out["last_hidden_state"], jnp.asarray(shared))
        result = {"logits": logits,
                  "cls_view1": out["last_hidden_state"][:, 0]}
        if not deterministic:
            # second dropout view for the contrastive pair (SimCSE)
            out2 = self.bert(input_ids, attention_mask, token_type_ids,
                             deterministic=False)
            result["cls_view2"] = out2["last_hidden_state"][:, 0]
        return result


def ckbert_pretrain_loss(outputs, batch, temperature=0.05, weight=0.1):
    """MLM CE + in-batch InfoNCE between the two dropout views."""
    mlm = losses.cross_entropy(outputs["logits"], batch["label_ids"],
                               ignore_index=-100)
    result = {"mlm_loss": mlm}
    total = mlm
    if "cls_view2" in outputs:
        a = outputs["cls_view1"].astype(jnp.float32)
        b = outputs["cls_view2"].astype(jnp.float32)
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        sim = a @ b.T / temperature
        cl = losses.cross_entropy(sim, jnp.arange(sim.shape[0]))
        total = mlm + weight * cl
        result["contrastive_loss"] = cl
    return {"loss": total, **result}


class CKBertLanguageModeling:
    """App plug-in: language_modeling with contrast_learning_flag=True
    dispatches this loss (see appzoo/language_modeling/model.py)."""

    @staticmethod
    def loss_fn(outputs, batch):
        return ckbert_pretrain_loss(outputs, batch)
