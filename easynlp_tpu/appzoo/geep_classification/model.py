"""GEEP early-exit classification.

Capability parity: reference easynlp/appzoo/geep_classification/model.py
:34-168 — per-layer exit classifiers for inference acceleration. TPU-native
shape: the scanned encoder emits every layer's hidden state in one pass
([L, B, S, E]); exit heads are applied with a vmap over the layer axis; at
inference the earliest exit whose confidence clears `exit_threshold` is
selected with pure vector ops (no data-dependent control flow — XLA-friendly
"compute all, select first confident").
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.sequence_classification.model import (
    SequenceClassification,
)
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
from easynlp_tpu.utils import losses


class GEEPModule(BaseModule):
    num_labels: int = 2
    exit_threshold: float = 0.9
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        c = self.config
        out = BertModel(c, dtype=self.dtype, remat=self.remat,
                        output_hidden_states=True, add_pooling_layer=False,
                        name="backbone")(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, deterministic=deterministic)
        all_hidden = out["hidden_states"]        # [L, B, S, E]
        cls = all_hidden[:, :, 0].astype(jnp.float32)  # [L, B, E]
        head = nn.Dense(
            self.num_labels, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(c.initializer_range),
                ("embed", "classes")),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros, ("classes",)),
            name="exit_head")
        exit_logits = head(cls)                  # [L, B, C] shared head
        probs = jax.nn.softmax(exit_logits, axis=-1)
        conf = jnp.max(probs, axis=-1)           # [L, B]
        # earliest layer whose confidence clears the threshold (else last)
        L = conf.shape[0]
        confident = conf >= self.exit_threshold
        first = jnp.argmax(confident, axis=0)
        any_conf = jnp.any(confident, axis=0)
        exit_layer = jnp.where(any_conf, first, L - 1)   # [B]
        chosen = jnp.take_along_axis(
            exit_logits, exit_layer[None, :, None], axis=0)[0]  # [B, C]
        return {"logits": chosen,
                "exit_logits": exit_logits,
                "exit_layer": exit_layer,
                "predictions": jnp.argmax(chosen, -1),
                "probabilities": jax.nn.softmax(chosen, -1)}


class GEEPClassification(SequenceClassification):
    @staticmethod
    def loss_fn(outputs, batch):
        """Sum of CE over all exits, linearly weighted by depth (deeper exits
        weigh more, reference training recipe)."""
        exit_logits = outputs["exit_logits"]     # [L, B, C]
        L = exit_logits.shape[0]
        weights = jnp.arange(1, L + 1, dtype=jnp.float32)
        weights = weights / weights.sum()
        per_layer = jax.vmap(
            lambda lg: losses.cross_entropy(lg, batch["label_ids"]))(exit_logits)
        return {"loss": jnp.sum(per_layer * weights),
                "final_exit_loss": per_layer[-1]}

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32,
                     num_labels=None, **kwargs):
        n = num_labels or getattr(config, "num_labels", 2)
        udp = getattr(args, "user_defined_parameters_dict", {}) if args else {}
        thr = float(udp.get("exit_threshold", 0.9))
        remat = getattr(args, "remat", "none") if args else "none"
        return GEEPModule(config=config, dtype=dtype, num_labels=n,
                          exit_threshold=thr, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        backbone = convert_bert_backbone(state_dict, config)
        backbone.pop("pooler", None)
        return {"backbone": backbone}
