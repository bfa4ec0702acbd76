"""TPU-native CLIP dual tower.

Capability parity: reference easynlp/modelzoo/models/clip/ (dual-tower
vision/text, reference appzoo/clip/model.py:40-162 contrastive setup;
Chinese-CLIP dialect: BERT text tower + ViT vision tower + linear projections
+ learned logit scale).

TPU re-design: patch embedding is an explicit space-to-depth reshape feeding
one [P²·3, E] matmul (guaranteed MXU path, no conv lowering ambiguity); the
transformer towers reuse the scanned pre-LN blocks; pooling is CLS token.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.modeling_utils import scan_unroll, BaseModule, truncated_normal_init
from easynlp_tpu.modelzoo.models.bert import BertModel
from easynlp_tpu.modelzoo.models.bert.modeling_bert import (
    ACT2FN,
    REMAT_POLICIES,
    _dense,
)
from easynlp_tpu.ops.attention import attention


class ViTBlock(nn.Module):
    """Pre-LN transformer block (scan body: carry = hidden)."""

    config: Any
    dtype: Any = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _=None):
        hidden = carry
        c = self.config
        h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        b, s, _e = hidden.shape

        normed = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="ln_1")(
            hidden).astype(self.dtype)
        qkv = _dense(3 * h * d, c, ("embed", "joined_kv"), dtype=self.dtype,
                     name="qkv")(normed).reshape(b, s, 3, h, d)
        ctx = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        ctx = ctx.reshape(b, s, h * d)
        attn_out = _dense(c.hidden_size, c, ("joined_kv", "embed"),
                          dtype=self.dtype, name="proj")(ctx)
        hidden = hidden + attn_out

        normed = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="ln_2")(
            hidden).astype(self.dtype)
        mlp = _dense(c.intermediate_size, c, ("embed", "mlp"),
                     dtype=self.dtype, name="fc1")(normed)
        mlp = ACT2FN[c.hidden_act](mlp)
        mlp = _dense(c.hidden_size, c, ("mlp", "embed"), dtype=self.dtype,
                     name="fc2")(mlp)
        hidden = hidden + mlp
        return hidden, None


# CLIP pixel normalisation constants (mirrors data/image_utils.py; kept in
# sync so the in-graph uint8 path matches the host float path exactly)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class ViTEncoder(BaseModule):
    """images [B, H, W, 3] → CLS embedding.

    Accepts float pixels (already host-normalised) OR raw uint8: integer
    input is normalised in-graph ((x/255 - mean)/std, CLIP constants,
    overridable via vision_config.image_mean/image_std). Shipping uint8
    over the host→device link quarters the pixel DMA traffic vs float32 —
    on CLIP training the pixel stream is the largest host→device transfer
    (B·H·W·3 bytes/step), so datasets emit uint8 and the cast+normalise
    runs fused on device."""

    remat: str = "none"

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        c = self.config
        if jnp.issubdtype(pixel_values.dtype, jnp.integer):
            # explicit None checks: a config may store mean/std as an
            # array (ambiguous truth value) or an all-zeros list (falsy)
            m = getattr(c, "image_mean", None)
            s = getattr(c, "image_std", None)
            mean = jnp.asarray(CLIP_IMAGE_MEAN if m is None else m,
                               jnp.float32)
            std = jnp.asarray(CLIP_IMAGE_STD if s is None else s,
                              jnp.float32)
            pixel_values = (pixel_values.astype(jnp.float32) / 255.0
                            - mean) / std
        b, hh, ww, ch = pixel_values.shape
        p = c.patch_size
        # space-to-depth patchify → one big matmul on the MXU
        x = pixel_values.reshape(b, hh // p, p, ww // p, p, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (hh // p) * (ww // p), p * p * ch)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     use_bias=False,
                     kernel_init=nn.with_logical_partitioning(
                         truncated_normal_init(c.initializer_range),
                         (None, "embed")),
                     name="patch_embedding")(x.astype(self.dtype))
        cls = self.param("class_embedding",
                         nn.with_logical_partitioning(
                             truncated_normal_init(c.initializer_range),
                             ("embed",)),
                         (c.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        n_pos = x.shape[1]
        pos = self.param("position_embedding",
                         nn.with_logical_partitioning(
                             truncated_normal_init(c.initializer_range),
                             ("length", "embed")),
                         (n_pos, c.hidden_size), jnp.float32)
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="pre_ln")(
            x).astype(self.dtype)

        block_cls = ViTBlock
        if self.remat in REMAT_POLICIES:
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 policy=REMAT_POLICIES[self.remat]())
        scan = nn.scan(block_cls, variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=c.num_hidden_layers,
                       metadata_params={nn.PARTITION_NAME: "layers"},
                       unroll=scan_unroll(c, c.num_hidden_layers))
        x, _ = scan(config=c, dtype=self.dtype,
                    deterministic=deterministic, name="layers")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="post_ln")(x)
        return {"last_hidden_state": x.astype(self.dtype),
                "pooler_output": x[:, 0].astype(self.dtype)}


class CLIPModel(BaseModule):
    """Dual tower. Returns normalised embeddings + scaled similarity."""

    remat: str = "none"

    def setup(self):
        c = self.config
        self.text_model = BertModel(c.text_config, dtype=self.dtype,
                                    add_pooling_layer=False, remat=self.remat)
        self.vision_model = ViTEncoder(config=c.vision_config,
                                       dtype=self.dtype, remat=self.remat)
        self.text_projection = nn.Dense(
            c.projection_dim, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(0.02), ("embed", "kv")))
        self.visual_projection = nn.Dense(
            c.projection_dim, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(0.02), ("embed", "kv")))
        self.logit_scale = self.param(
            "logit_scale",
            nn.with_logical_partitioning(
                lambda key, shape, dtype=jnp.float32: jnp.full(
                    shape, self.config.logit_scale_init_value, dtype), ()),
            (), jnp.float32)

    def get_text_features(self, input_ids, attention_mask=None,
                          token_type_ids=None, deterministic=True):
        out = self.text_model(input_ids, attention_mask=attention_mask,
                              token_type_ids=token_type_ids,
                              deterministic=deterministic)
        emb = self.text_projection(
            out["last_hidden_state"][:, 0].astype(jnp.float32))
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    def get_image_features(self, pixel_values, deterministic=True):
        out = self.vision_model(pixel_values, deterministic=deterministic)
        emb = self.visual_projection(out["pooler_output"].astype(jnp.float32))
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, pixel_values=None, deterministic=True):
        out = {}
        if input_ids is not None:
            out["text_embeds"] = self.get_text_features(
                input_ids, attention_mask, token_type_ids, deterministic)
        if pixel_values is not None:
            out["image_embeds"] = self.get_image_features(
                pixel_values, deterministic)
        if "text_embeds" in out and "image_embeds" in out:
            scale = jnp.exp(self.logit_scale)
            out["logits_per_text"] = scale * (
                out["text_embeds"] @ out["image_embeds"].T)
            out["logits_per_image"] = out["logits_per_text"].T
        return out
