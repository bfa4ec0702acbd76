"""Text↔video retrieval (CLIP4Clip).

Capability parity: reference easynlp/appzoo/text2video_retrieval/ — CLIP4Clip
frame-mean pooling: each sampled frame goes through the CLIP vision tower,
frame embeddings are mean-pooled into one video embedding, and retrieval is
the same in-batch contrastive objective as CLIP.
"""

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.clip.model import CLIPApp
from easynlp_tpu.modelzoo.models.clip import CLIPConfig, CLIPModel
from easynlp_tpu.utils import losses


class CLIP4ClipModule(CLIPModel):
    """pixel_values: [B, F, H, W, 3] — frames folded into the batch for the
    vision tower (one big MXU-friendly batch), then mean-pooled per video."""

    def get_video_features(self, pixel_values, video_masks=None,
                           deterministic=True):
        b, f = pixel_values.shape[:2]
        frames = pixel_values.reshape((b * f,) + pixel_values.shape[2:])
        emb = self.get_image_features(frames, deterministic)  # [B*F, P]
        emb = emb.reshape(b, f, -1)
        if video_masks is not None:
            # masked mean over real frames (reference CLIP4Clip mean-pools
            # only unpadded frames via video_mask)
            w = video_masks.astype(emb.dtype)[:, :, None]
            emb = (emb * w).sum(axis=1) / jnp.maximum(
                w.sum(axis=1), 1.0)
        else:
            emb = emb.mean(axis=1)
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, pixel_values=None, video_masks=None,
                 deterministic=True):
        out = {}
        if input_ids is not None:
            out["text_embeds"] = self.get_text_features(
                input_ids, attention_mask, token_type_ids, deterministic)
        if pixel_values is not None:
            if pixel_values.ndim == 5:
                out["video_embeds"] = self.get_video_features(
                    pixel_values, video_masks, deterministic)
            else:
                out["video_embeds"] = self.get_image_features(
                    pixel_values, deterministic)
        if "text_embeds" in out and "video_embeds" in out:
            scale = jnp.exp(self.logit_scale)
            out["logits_per_text"] = scale * (
                out["text_embeds"] @ out["video_embeds"].T)
            out["image_embeds"] = out["video_embeds"]  # evaluator reuse
        return out


class Text2VideoRetrieval(CLIPApp):
    model_input_keys = ("input_ids", "attention_mask", "token_type_ids",
                        "pixel_values", "video_masks")

    def sample_inputs(self):
        vc = self.config.vision_config
        return {"input_ids": jnp.ones((1, 8), jnp.int32),
                "pixel_values": jnp.ones(
                    (1, 2, vc.image_size, vc.image_size, 3), jnp.float32)}

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return CLIP4ClipModule(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        import jax
        vc = config.vision_config
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            input_ids=jnp.ones((1, 8), jnp.int32),
            pixel_values=jnp.ones((1, 2, vc.image_size, vc.image_size, 3),
                                  jnp.float32),
            deterministic=True)
        return nn.unbox(variables["params"])
