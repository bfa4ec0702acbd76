"""Sentence-embedding extraction app (capability parity: reference
easynlp/appzoo/feature_vectorization/ — predict-only)."""

import jax.numpy as jnp

from easynlp_tpu.appzoo.text_match.model import TextMatchTwoTower, TwoTowerModule
from easynlp_tpu.modelzoo.models.bert import BertConfig


class FeatureVectorization(TextMatchTwoTower):
    """Single-tower embedding extraction: forward returns 'embeddings'."""

    model_input_keys = ("input_ids", "attention_mask", "token_type_ids")

    @staticmethod
    def loss_fn(outputs, batch):
        raise NotImplementedError("vectorization is a predict-only app")
