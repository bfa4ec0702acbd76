"""Few-shot PET / CPT applications.

Capability parity: reference easynlp/fewshot_learning/fewshot_application.py
— FewshotClassification (:30-151): MLM cloze over a pattern, class logits =
MLM logits at the mask position gathered at the verbalizer token ids;
CPTClassification (:152-226): contrastive prompt tuning over the mask-position
representations.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertForMaskedLM
from easynlp_tpu.modelzoo.models.bert.conversion import (
    convert_bert_for_masked_lm,
)
from easynlp_tpu.utils import losses


class FewshotModule(BertForMaskedLM):
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 mask_positions=None, verbalizer_ids=None, deterministic=True):
        out = super().__call__(input_ids, attention_mask, token_type_ids,
                               deterministic=deterministic)
        if mask_positions is not None:
            mlm_logits = out["logits"]  # [B, S, V]
            at_mask = jnp.take_along_axis(
                mlm_logits, mask_positions[:, None, None], axis=1)[:, 0]
            out["mask_logits"] = at_mask  # [B, V]
            if verbalizer_ids is not None:
                out["logits"] = jnp.take_along_axis(
                    at_mask, verbalizer_ids, axis=-1)  # [B, C]
                out["predictions"] = jnp.argmax(out["logits"], -1)
                out["probabilities"] = jax.nn.softmax(out["logits"], -1)
        return out


class FewshotClassification(Application):
    model_input_keys = ("input_ids", "attention_mask", "token_type_ids",
                        "mask_positions", "verbalizer_ids")

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.cross_entropy(outputs["logits"],
                                             batch["label_ids"])}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return FewshotModule(config=config, dtype=dtype, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        return convert_bert_for_masked_lm(state_dict, config)


class CPTClassification(FewshotClassification):
    """Contrastive prompt tuning: in-batch contrastive loss over mask-position
    hidden vocabulary distributions + CE (reference :152-226)."""

    cl_weight = 0.1

    @staticmethod
    def loss_fn(outputs, batch):
        ce = losses.cross_entropy(outputs["logits"], batch["label_ids"])
        # contrastive: same-label rows are positives over normalized
        # mask-position logits
        reps = outputs["mask_logits"].astype(jnp.float32)
        reps = reps / (jnp.linalg.norm(reps, axis=-1, keepdims=True) + 1e-8)
        sim = reps @ reps.T / 0.1
        labels = batch["label_ids"]
        pos = (labels[:, None] == labels[None, :]).astype(jnp.float32)
        eye = jnp.eye(sim.shape[0])
        pos = pos * (1 - eye)
        logp = jax.nn.log_softmax(
            jnp.where(eye > 0, -1e30, sim), axis=-1)
        denom = jnp.maximum(pos.sum(-1), 1.0)
        cl = -jnp.mean(jnp.sum(pos * logp, -1) / denom)
        return {"loss": ce + CPTClassification.cl_weight * cl,
                "ce_loss": ce, "cl_loss": cl}
