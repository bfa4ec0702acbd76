"""MLM pretraining application.

Capability parity: reference easynlp/appzoo/language_modeling/model.py —
BertForMaskedLM backbone, MLM CE over masked positions (:68-88). Knowledge-
injection branches: DKPLM (models/dkplm), CKBERT contrastive (below,
contrast_learning_flag), Kangaroo (models/kangaroo alias of the DKPLM seam).
"""

import jax.numpy as jnp

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertForMaskedLM
from easynlp_tpu.modelzoo.models.bert.conversion import (
    convert_bert_for_masked_lm,
)
from easynlp_tpu.utils import losses


class LanguageModeling(Application):
    model_input_keys = ("input_ids", "attention_mask", "token_type_ids")

    @staticmethod
    def loss_fn(outputs, batch):
        loss = losses.cross_entropy(outputs["logits"], batch["label_ids"],
                                    ignore_index=-100)
        return {"loss": loss}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return BertForMaskedLM(config=config, dtype=dtype, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        return convert_bert_for_masked_lm(state_dict, config)


class CKBertLanguageModeling(LanguageModeling):
    """CKBERT branch (contrast_learning_flag): MLM + SimCSE-style two-view
    contrastive loss (reference core/trainer.py:582-599 hook)."""

    @staticmethod
    def loss_fn(outputs, batch):
        from easynlp_tpu.modelzoo.models.ckbert import ckbert_pretrain_loss
        return ckbert_pretrain_loss(outputs, batch)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        from easynlp_tpu.modelzoo.models.ckbert import (CKBertConfig,
                                                        CKBertForPreTraining)
        remat = getattr(args, "remat", "none") if args else "none"
        if not isinstance(config, CKBertConfig):
            config = CKBertConfig(**{k: v for k, v in config.to_dict().items()
                                     if k != "model_type"})
        return CKBertForPreTraining(config=config, dtype=dtype, remat=remat)
