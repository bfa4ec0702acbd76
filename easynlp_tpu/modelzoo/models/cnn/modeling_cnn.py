"""TextCNN encoder (capability parity: reference easynlp/modelzoo/models/cnn/
— multi-width 1D convolutions over token embeddings, max-pooled and
concatenated; used as a lightweight classification/distillation-student
backbone)."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init


class TextCNNConfig(PretrainedConfig):
    model_type = "cnn"

    def __init__(self, vocab_size=21128, embedding_size=128,
                 kernel_sizes=(2, 3, 4, 5), num_filters=100, **kwargs):
        self.embedding_size = embedding_size
        self.kernel_sizes = tuple(kernel_sizes)
        self.num_filters = num_filters
        kwargs.setdefault("hidden_size",
                          num_filters * len(self.kernel_sizes))
        super().__init__(vocab_size=vocab_size, **kwargs)


class TextCNNModel(BaseModule):
    """Returns pooler_output [B, num_filters * len(kernel_sizes)]."""

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        c = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        emb = nn.Embed(c.vocab_size, c.embedding_size,
                       param_dtype=jnp.float32,
                       embedding_init=nn.with_logical_partitioning(
                           truncated_normal_init(c.initializer_range),
                           ("vocab", "embed")),
                       name="embeddings")(input_ids).astype(self.dtype)
        neg = jnp.float32(-1e30).astype(self.dtype)
        feats = []
        for k in c.kernel_sizes:
            conv = nn.Conv(c.num_filters, (k,), padding="SAME",
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="conv_%d" % k)(emb)
            conv = nn.relu(conv)
            conv = jnp.where(attention_mask[..., None] > 0, conv, neg)
            feats.append(jnp.max(conv, axis=1))
        pooled = jnp.concatenate(feats, axis=-1)
        pooled = nn.Dropout(c.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        return {"pooler_output": pooled, "last_hidden_state": emb}
