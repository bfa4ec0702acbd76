"""Information extraction: K-Global-Pointer.

Capability parity: reference easynlp/appzoo/information_extraction/model.py
:9-53 — global pointer scoring with sinusoidal rotary relative positions over
span (start, end) pairs, serving NER/RE/EE through one span-scoring head.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone


def rope(x):
    """Rotary position embedding over the last dim ([B, S, H, D])."""
    b, s, h, d = x.shape
    pos = jnp.arange(s, dtype=jnp.float32)
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = pos[:, None] * inv[None, :]               # [S, D/2]
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.stack([out1, out2], axis=-1).reshape(b, s, h, d)


class GlobalPointerModule(BaseModule):
    num_entity_types: int = 1
    head_size: int = 64
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        c = self.config
        out = BertModel(c, dtype=self.dtype, remat=self.remat,
                        add_pooling_layer=False, name="backbone")(
            input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, deterministic=deterministic)
        hidden = out["last_hidden_state"].astype(jnp.float32)
        b, s, _ = hidden.shape
        t, d = self.num_entity_types, self.head_size
        qk = nn.Dense(
            t * d * 2, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(c.initializer_range),
                ("embed", "classes")),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros, ("classes",)),
            name="pointer")(hidden).reshape(b, s, t, 2, d)
        q, k = rope(qk[..., 0, :]), rope(qk[..., 1, :])
        # q [B, i, T, D], k [B, j, T, D] → scores [B, T, i, j]
        scores = jnp.einsum("bied,bjed->beij", q, k) / jnp.sqrt(jnp.float32(d))
        # mask padding rows/cols and spans with end < start
        if attention_mask is not None:
            m = attention_mask.astype(bool)
            scores = jnp.where(m[:, None, :, None] & m[:, None, None, :],
                               scores, -1e30)
        tri = jnp.tril(jnp.ones((s, s), bool), k=-1)
        scores = jnp.where(tri[None, None], -1e30, scores)
        return {"span_scores": scores}


class InformationExtractionModel(Application):
    @staticmethod
    def loss_fn(outputs, batch):
        """Global-pointer multilabel CE (reference model.py:9-53):
        log(1+Σ_neg e^s) + log(1+Σ_pos e^-s) per (batch, type)."""
        scores = outputs["span_scores"].astype(jnp.float32)
        labels = batch["span_labels"].astype(jnp.float32)  # [B,T,S,S] 0/1
        valid = scores > -1e29
        s_pos = jnp.where((labels > 0) & valid, -scores, -1e30)
        s_neg = jnp.where((labels == 0) & valid, scores, -1e30)
        zeros = jnp.zeros(scores.shape[:2] + (1,), jnp.float32)
        pos = jnp.concatenate([s_pos.reshape(*scores.shape[:2], -1), zeros], -1)
        neg = jnp.concatenate([s_neg.reshape(*scores.shape[:2], -1), zeros], -1)
        import jax
        loss = (jax.nn.logsumexp(pos, -1) + jax.nn.logsumexp(neg, -1)).mean()
        return {"loss": loss}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return BertConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32,
                     num_entity_types=None, num_labels=None, **kwargs):
        t = num_entity_types or num_labels or 1
        remat = getattr(args, "remat", "none") if args else "none"
        return GlobalPointerModule(config=config, dtype=dtype,
                                   num_entity_types=t, remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        backbone = convert_bert_backbone(state_dict, config)
        backbone.pop("pooler", None)
        return {"backbone": backbone}
