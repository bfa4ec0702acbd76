"""Sequence labeling (NER) application.

Capability parity: reference easynlp/appzoo/sequence_labeling/model.py —
BERT backbone + per-token classifier, CE ignoring special/pad positions.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
from easynlp_tpu.utils import losses


class SequenceLabelingModule(BaseModule):
    num_labels: int = 2
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        out = BertModel(self.config, dtype=self.dtype, remat=self.remat,
                        add_pooling_layer=False, name="backbone")(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, deterministic=deterministic)
        hidden = out["last_hidden_state"]
        hidden = nn.Dropout(self.config.hidden_dropout_prob)(
            hidden, deterministic=deterministic)
        logits = nn.Dense(
            self.num_labels, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(self.config.initializer_range),
                ("embed", "classes")),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros, ("classes",)),
            name="classifier")(hidden.astype(jnp.float32))
        return {"logits": logits, "predictions": jnp.argmax(logits, axis=-1)}


class SequenceLabeling(Application):
    @staticmethod
    def loss_fn(outputs, batch):
        # label_ids: [B, S] with -100 on CLS/SEP/PAD/subword positions
        return {"loss": losses.cross_entropy(
            outputs["logits"], batch["label_ids"], ignore_index=-100)}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, num_labels=None,
                     **kwargs):
        n = num_labels or getattr(config, "num_labels", 2)
        remat = getattr(args, "remat", "none") if args else "none"
        return SequenceLabelingModule(config=config, dtype=dtype,
                                      num_labels=n, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        backbone = convert_bert_backbone(state_dict, config)
        backbone.pop("pooler", None)
        params = {"backbone": backbone}
        if "classifier.weight" in state_dict:
            params["classifier"] = {
                "kernel": state_dict["classifier.weight"].T,
                "bias": state_dict["classifier.bias"]}
        return params
