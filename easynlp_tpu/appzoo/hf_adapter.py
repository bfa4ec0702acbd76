"""Run raw HuggingFace `transformers` Flax models under the easynlp_tpu
Trainer/Evaluator/Predictor.

Capability parity: reference examples/hf_adapter_easynlp (HfTrainer/
HfEvaluator/HfPredictor wrap raw HF torch models into the EasyNLP loop;
SURVEY.md §2.10 flags this compat seam). TPU-native shape: `transformers`
ships Flax variants of its models; this adapter wraps any
`FlaxPreTrainedModel` into the Application contract — its inner flax
module + params slot straight into the jitted pjit train step, so the
whole Trainer feature set (bf16, mesh sharding, grad accumulation,
NaN-skip, checkpointing) applies to stock HF models with zero porting.

    from transformers import FlaxBertForSequenceClassification
    hf = FlaxBertForSequenceClassification.from_pretrained(path)
    app = HFAdapterClassification.from_hf(hf, label_mapping={"neg":0,"pos":1})
    Trainer(app, train_dataset, evaluator, args=args).train()
"""

from typing import Any

import jax
import jax.numpy as jnp

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.utils import losses


class _FlaxModuleShim:
    """Duck-typed flax-module front for an HF Flax module: fills the
    positional inputs HF modules require (position_ids, head_mask) and
    accepts the keyword calling convention the Trainer uses."""

    def __init__(self, hf_module):
        self.hf_module = hf_module

    def _full_inputs(self, input_ids, attention_mask, token_type_ids):
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        position_ids = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        head_mask = None
        return (input_ids, attention_mask, token_type_ids, position_ids,
                head_mask)

    def apply(self, variables, input_ids, attention_mask=None,
              token_type_ids=None, deterministic=True, rngs=None):
        return self.hf_module.apply(
            variables, *self._full_inputs(input_ids, attention_mask,
                                          token_type_ids),
            deterministic=deterministic, rngs=rngs)

    def init(self, rngs, input_ids, attention_mask=None, token_type_ids=None,
             deterministic=True):
        return self.hf_module.init(
            rngs, *self._full_inputs(input_ids, attention_mask,
                                     token_type_ids),
            deterministic=deterministic)


class HFAdapterClassification(Application):
    """Sequence classification over any HF Flax *ForSequenceClassification
    model (logits head + CE loss, reference hf_ez_nlp_user_defined.py)."""

    model_input_keys = ("input_ids", "attention_mask", "token_type_ids")

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.cross_entropy(outputs["logits"],
                                             batch["label_ids"])}

    @classmethod
    def from_hf(cls, hf_model, label_mapping=None):
        """hf_model: a transformers FlaxPreTrainedModel instance."""
        module = _FlaxModuleShim(hf_model.module)
        self = cls(module, hf_model.params, hf_model.config,
                   label_mapping=label_mapping)
        return self

    def forward(self, batch, params=None):
        inputs = {k: batch[k] for k in self.model_input_keys if k in batch}
        out = self.module.apply({"params": params or self.params}, **inputs,
                                deterministic=True)
        logits = out["logits"]
        return {"logits": logits,
                "predictions": jnp.argmax(logits, axis=-1),
                "probabilities": jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1)}


class HFAdapterMaskedLM(HFAdapterClassification):
    """MLM over any HF Flax *ForMaskedLM model (label_ids = -100-masked)."""

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.cross_entropy(outputs["logits"],
                                             batch["label_ids"],
                                             ignore_index=-100)}
