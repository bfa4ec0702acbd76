"""Machine reading comprehension (SQuAD-style span extraction).

Capability parity: reference easynlp/appzoo/machine_reading_comprehension/
model.py:61-100 — token-level 2-logit head split into start/end logits, CE
with answer positions clamped to the ignored index; span labels ride in
label_ids[:, 0:2] (start, end token positions).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
from easynlp_tpu.utils import losses


class MRCModule(BaseModule):
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        out = BertModel(self.config, dtype=self.dtype, remat=self.remat,
                        add_pooling_layer=False, name="backbone")(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, deterministic=deterministic)
        logits = nn.Dense(
            2, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(self.config.initializer_range),
                ("embed", "classes")),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros, ("classes",)),
            name="qa_outputs")(
            out["last_hidden_state"].astype(jnp.float32))
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        # padding positions can never be answers
        if attention_mask is not None:
            neg = jnp.float32(-1e30)
            start_logits = jnp.where(attention_mask > 0, start_logits, neg)
            end_logits = jnp.where(attention_mask > 0, end_logits, neg)
        return {"start_logits": start_logits, "end_logits": end_logits,
                "start_predictions": jnp.argmax(start_logits, -1),
                "end_predictions": jnp.argmax(end_logits, -1)}


class MachineReadingComprehension(Application):
    @staticmethod
    def loss_fn(outputs, batch):
        """CE over start/end with positions clamped to seq_len (reference
        model.py:94-96: labels outside the window → ignored_index)."""
        seq_len = outputs["start_logits"].shape[-1]
        start = jnp.clip(batch["start_positions"], 0, seq_len - 1)
        end = jnp.clip(batch["end_positions"], 0, seq_len - 1)
        loss = 0.5 * (losses.cross_entropy(outputs["start_logits"], start)
                      + losses.cross_entropy(outputs["end_logits"], end))
        return {"loss": loss}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return MRCModule(config=config, dtype=dtype, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        backbone = convert_bert_backbone(state_dict, config)
        backbone.pop("pooler", None)
        params = {"backbone": backbone}
        if "qa_outputs.weight" in state_dict:
            params["qa_outputs"] = {
                "kernel": state_dict["qa_outputs.weight"].T,
                "bias": state_dict["qa_outputs.bias"]}
        return params
