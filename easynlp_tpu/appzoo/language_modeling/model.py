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


class DKPLMLanguageModeling(LanguageModeling):
    """DKPLM pretraining: MLM CE + decode-knowledge CE with TransE
    pseudo-entity injection (reference appzoo/language_modeling/model.py
    :68-88 + models/dkplm)."""

    model_input_keys = ("input_ids", "attention_mask", "token_type_ids",
                        "insert_know_emb", "insert_know_position_mask")

    @staticmethod
    def loss_fn(outputs, batch):
        from easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm import (
            dkplm_pretrain_loss)
        return dkplm_pretrain_loss(outputs, batch)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        from easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm import (
            DKPLMConfig, DKPLMForPreTraining)
        remat = getattr(args, "remat", "none") if args else "none"
        if not isinstance(config, DKPLMConfig):
            config = DKPLMConfig(**{k: v for k, v in config.to_dict().items()
                                    if k != "model_type"})
        return DKPLMForPreTraining(config=config, dtype=dtype, remat=remat)

    def sample_inputs(self):
        c = self.config
        return {"input_ids": jnp.ones((1, 8), jnp.int32),
                "insert_know_emb": jnp.zeros(
                    (1, 8, c.knowledge_emb_size), jnp.float32),
                "insert_know_position_mask": jnp.zeros((1, 8), jnp.int32)}

    @classmethod
    def init_params(cls, module, config, seed=0):
        import jax
        from flax import linen as nn
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            input_ids=jnp.ones((1, 8), jnp.int32),
            insert_know_emb=jnp.zeros((1, 8, config.knowledge_emb_size),
                                      jnp.float32),
            insert_know_position_mask=jnp.zeros((1, 8), jnp.int32),
            deterministic=True)
        return nn.unbox(variables["params"])


class KangarooLanguageModeling(LanguageModeling):
    """Kangaroo pretraining: MLM + entity-sample contrastive CE (reference
    modelzoo/models/kangaroo/modeling_kangaroo.py:1704-1714 —
    total = masked_lm + contrast)."""

    model_input_keys = ("input_ids", "attention_mask", "entities_position",
                        "ent_mask", "sample_token_id", "sample_position_id",
                        "sample_mask", "concept_emb")

    @staticmethod
    def loss_fn(outputs, batch):
        mlm = losses.cross_entropy(outputs["logits"], batch["label_ids"],
                                   ignore_index=-100)
        out = {"loss": mlm, "mlm_loss": mlm}
        if "cos_score" in outputs:
            contrast = losses.cross_entropy(outputs["cos_score"],
                                            outputs["sample_label"],
                                            ignore_index=-100)
            out["contrast_loss"] = contrast
            out["loss"] = mlm + contrast
        return out

    def sample_inputs(self):
        c = self.config
        return {
            "input_ids": jnp.ones((1, 16), jnp.int32),
            "entities_position": jnp.zeros((1, 16), jnp.int32),
            "ent_mask": jnp.zeros((1, 16), jnp.int32),
            "sample_token_id": jnp.ones((1, c.ent_num, c.sample_num, 16),
                                        jnp.int32),
            "concept_emb": jnp.zeros((1, c.ent_num, c.concept_size),
                                     jnp.float32),
        }

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        from easynlp_tpu.modelzoo.models.kangaroo import KangarooConfig
        return KangarooConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        from easynlp_tpu.modelzoo.models.kangaroo import (
            KangarooConfig, KangarooForPreTraining)
        remat = getattr(args, "remat", "none") if args else "none"
        if not isinstance(config, KangarooConfig):
            config = KangarooConfig(**{k: v for k, v
                                       in config.to_dict().items()
                                       if k != "model_type"})
        return KangarooForPreTraining(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        import jax
        from flax import linen as nn
        rng = jax.random.PRNGKey(seed)
        c = config
        variables = module.init(
            {"params": rng, "dropout": rng},
            input_ids=jnp.ones((1, 16), jnp.int32),
            entities_position=jnp.zeros((1, 16), jnp.int32),
            ent_mask=jnp.zeros((1, 16), jnp.int32),
            sample_token_id=jnp.ones((1, c.ent_num, c.sample_num, 16),
                                     jnp.int32),
            concept_emb=jnp.zeros((1, c.ent_num, c.concept_size),
                                  jnp.float32),
            deterministic=True)
        return nn.unbox(variables["params"])

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        from easynlp_tpu.modelzoo.models.kangaroo.modeling_kangaroo import (
            convert_kangaroo)
        return convert_kangaroo(state_dict, config)


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
