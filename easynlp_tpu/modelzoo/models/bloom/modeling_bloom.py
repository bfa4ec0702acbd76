"""TPU-native BLOOM.

Capability parity: reference easynlp/modelzoo/models/bloom/ — decoder LM with
ALiBi attention biases (no position embeddings), embedding LayerNorm, pre-LN
blocks, tied head. Scanned layers + fused QKV like the rest of the zoo; the
ALiBi bias is computed once per (S, S) and shared by all layers (slopes differ
per head, folded into the bias tensor)."""

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert.modeling_bert import ACT2FN, REMAT_POLICIES
from easynlp_tpu.ops.attention import attention


class BloomConfig(PretrainedConfig):
    model_type = "bloom"

    def __init__(self, vocab_size=250880, hidden_size=1024, n_layer=24,
                 n_head=16, layer_norm_epsilon=1e-5, hidden_dropout=0.0,
                 attention_dropout=0.0, initializer_range=0.02,
                 bos_token_id=1, eos_token_id=2, **kwargs):
        self.n_layer = n_layer
        self.n_head = n_head
        self.layer_norm_epsilon = layer_norm_epsilon
        self.hidden_dropout = hidden_dropout
        self.attention_dropout = attention_dropout
        kwargs.setdefault("num_hidden_layers", n_layer)
        kwargs.setdefault("num_attention_heads", n_head)
        kwargs.setdefault("is_decoder", True)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         initializer_range=initializer_range,
                         bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         **kwargs)


def alibi_slopes(n_heads):
    """HF BLOOM slope schedule."""
    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** (i + 1) for i in range(closest)]
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [extra_base ** (2 * i + 1)
                   for i in range(n_heads - closest)]
    return np.asarray(slopes, np.float32)


def alibi_bias(attention_mask, n_heads):
    """ALiBi additive bias [B, H, 1, S] following HF semantics: distance is
    the masked cumulative position of each KEY relative to the query."""
    slopes = jnp.asarray(alibi_slopes(n_heads))          # [H]
    positions = (jnp.cumsum(attention_mask, axis=-1) - 1) * attention_mask
    # bias for key j (independent of query i in HF's formulation)
    return slopes[None, :, None, None] * positions[:, None, None, :]


class BloomBlock(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _=None):
        hidden, bias, kv_mask = carry
        c = self.config
        h = c.n_head
        d = c.hidden_size // h
        b, s, _e = hidden.shape

        def ln(name):
            return nn.LayerNorm(epsilon=c.layer_norm_epsilon,
                                dtype=jnp.float32, param_dtype=jnp.float32,
                                scale_init=nn.with_logical_partitioning(
                                    nn.initializers.ones, ("embed",)),
                                bias_init=nn.with_logical_partitioning(
                                    nn.initializers.zeros, ("embed",)),
                                name=name)

        def dense(features, axes, name):
            return nn.Dense(features, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=nn.with_logical_partitioning(
                                truncated_normal_init(c.initializer_range),
                                axes),
                            bias_init=nn.with_logical_partitioning(
                                nn.initializers.zeros, (axes[-1],)),
                            name=name)

        normed = ln("input_layernorm")(hidden).astype(self.dtype)
        # HF bloom fuses qkv per-head: [..., h, 3, d]
        qkv = dense(3 * h * d, ("embed", "joined_kv"), "query_key_value")(
            normed).reshape(b, s, h, 3, d)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        ctx = attention(q, k, v, kv_mask=kv_mask, causal=True, bias=bias)
        attn_out = dense(c.hidden_size, ("joined_kv", "embed"), "dense")(
            ctx.reshape(b, s, h * d))
        hidden = hidden + nn.Dropout(c.hidden_dropout)(
            attn_out, deterministic=self.deterministic)

        normed = ln("post_attention_layernorm")(hidden).astype(self.dtype)
        mlp = dense(4 * c.hidden_size, ("embed", "mlp"),
                    "dense_h_to_4h")(normed)
        mlp = ACT2FN["gelu"](mlp)
        mlp = dense(c.hidden_size, ("mlp", "embed"), "dense_4h_to_h")(mlp)
        hidden = hidden + nn.Dropout(c.hidden_dropout)(
            mlp, deterministic=self.deterministic)
        return (hidden, bias, kv_mask), None


class BloomModel(BaseModule):
    remat: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        c = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        emb = nn.Embed(c.vocab_size, c.hidden_size, param_dtype=jnp.float32,
                       embedding_init=nn.with_logical_partitioning(
                           truncated_normal_init(c.initializer_range),
                           ("vocab", "embed")),
                       name="word_embeddings")(input_ids)
        emb = nn.LayerNorm(epsilon=c.layer_norm_epsilon, dtype=jnp.float32,
                           param_dtype=jnp.float32,
                           scale_init=nn.with_logical_partitioning(
                               nn.initializers.ones, ("embed",)),
                           bias_init=nn.with_logical_partitioning(
                               nn.initializers.zeros, ("embed",)),
                           name="word_embeddings_layernorm")(emb)
        hidden = emb.astype(self.dtype)
        bias = alibi_bias(attention_mask, c.n_head)  # [B,H,1,S]

        block_cls = BloomBlock
        if self.remat in REMAT_POLICIES:
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        scan = nn.scan(block_cls, variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=c.n_layer,
                       metadata_params={nn.PARTITION_NAME: "layers"},
                       unroll=scan_unroll(c, c.n_layer))
        (hidden, _, _), _ = scan(
            config=c, dtype=self.dtype, deterministic=deterministic,
            name="h")((hidden, bias, attention_mask.astype(bool)))
        hidden = nn.LayerNorm(epsilon=c.layer_norm_epsilon, dtype=jnp.float32,
                              param_dtype=jnp.float32,
                              scale_init=nn.with_logical_partitioning(
                                  nn.initializers.ones, ("embed",)),
                              bias_init=nn.with_logical_partitioning(
                                  nn.initializers.zeros, ("embed",)),
                              name="ln_f")(hidden).astype(self.dtype)
        return {"last_hidden_state": hidden}


class BloomForCausalLM(BaseModule):
    remat: str = "none"

    def setup(self):
        self.transformer = BloomModel(self.config, dtype=self.dtype,
                                      remat=self.remat)

    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        out = self.transformer(input_ids, attention_mask, deterministic)
        wte = nn.unbox(self.transformer.variables["params"][
            "word_embeddings"]["embedding"])
        out["logits"] = jnp.einsum("bse,ve->bsv", out["last_hidden_state"],
                                   jnp.asarray(wte).astype(self.dtype))
        return out


def convert_bloom_state_dict(state_dict, config):
    s = {}
    for k, v in state_dict.items():
        k = k[len("transformer."):] if k.startswith("transformer.") else k
        s[k] = np.asarray(v)
    L, h = config.n_layer, config.n_head
    d = config.hidden_size // h

    def ln(key):
        return {"scale": s[key + ".weight"], "bias": s[key + ".bias"]}

    def dense_t(key):
        return {"kernel": s[key + ".weight"].T, "bias": s[key + ".bias"]}

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def qkv(i):
        # HF layout rows: [h, 3, d] over output dim — already matches our
        # reshape (b, s, h, 3, d), so a plain transpose suffices
        return dense_t("h.%d.self_attention.query_key_value" % i)

    params = {"transformer": {
        "word_embeddings": {"embedding": s["word_embeddings.weight"]},
        "word_embeddings_layernorm": ln("word_embeddings_layernorm"),
        "h": {
            "input_layernorm": stack(lambda i: ln("h.%d.input_layernorm" % i)),
            "query_key_value": stack(qkv),
            "dense": stack(lambda i: dense_t("h.%d.self_attention.dense" % i)),
            "post_attention_layernorm": stack(
                lambda i: ln("h.%d.post_attention_layernorm" % i)),
            "dense_h_to_4h": stack(lambda i: dense_t("h.%d.mlp.dense_h_to_4h" % i)),
            "dense_4h_to_h": stack(lambda i: dense_t("h.%d.mlp.dense_4h_to_h" % i)),
        },
        "ln_f": ln("ln_f"),
    }}
    return params
