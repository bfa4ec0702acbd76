"""Text classification application.

Capability parity: reference easynlp/appzoo/sequence_classification/model.py
(SequenceClassification :27-73 — BERT-family backbone + dropout + linear head;
MultiLabel variant w/ BCE :79-90). The head module is flax; the loss is a pure
function the Trainer jits together with the forward."""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
from easynlp_tpu.utils import losses


class SequenceClassificationModule(BaseModule):
    num_labels: int = 2
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        out = BertModel(self.config, dtype=self.dtype, remat=self.remat,
                        name="backbone")(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, deterministic=deterministic)
        pooled = out["pooler_output"]
        pooled = nn.Dropout(self.config.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = nn.Dense(
            self.num_labels,
            dtype=jnp.float32,  # head in fp32: cheap, keeps loss exact
            param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(self.config.initializer_range),
                ("embed", "classes")),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros, ("classes",)),
            name="classifier")(pooled.astype(jnp.float32))
        return {"logits": logits,
                "predictions": jnp.argmax(logits, axis=-1),
                "probabilities": nn.softmax(logits, axis=-1)}


class SequenceClassification(Application):
    model_input_keys = ("input_ids", "attention_mask", "token_type_ids")

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.cross_entropy(outputs["logits"],
                                             batch["label_ids"])}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, num_labels=None,
                     **kwargs):
        n = num_labels or getattr(config, "num_labels", 2)
        remat = getattr(args, "remat", "none") if args else "none"
        return SequenceClassificationModule(config=config, dtype=dtype,
                                            num_labels=n, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        params = {"backbone": convert_bert_backbone(state_dict, config)}
        # reference fine-tuned checkpoints carry classifier.{weight,bias}
        if "classifier.weight" in state_dict:
            params["classifier"] = {
                "kernel": state_dict["classifier.weight"].T,
                "bias": state_dict["classifier.bias"]}
        return params


class SequenceMultiLabelClassification(SequenceClassification):
    """Multi-label variant (reference model.py:79-90): sigmoid BCE over a
    multi-hot label matrix."""

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.multi_label_sigmoid_ce(
            outputs["logits"], batch["label_ids"])}
