"""Video → text generation (frame captioning).

Capability parity: reference easynlp/appzoo/video2text_generation/ — CLIP
frame features → GPT captioner. Frames fold into the vision-tower batch; the
per-frame CLS tokens become the GPT prefix.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.image2text_generation.model import (
    CLIPGPTImageTextGeneration,
    CLIPGPTImageTextModule,
    I2TConfig,
)


class CLIPGPTFrameTextModule(CLIPGPTImageTextModule):
    def encode_image(self, pixel_values, deterministic=True):
        # pixel_values [B, F, H, W, 3] → per-frame CLS prefix [B, F, E]
        if pixel_values.ndim == 5:
            b, f = pixel_values.shape[:2]
            frames = pixel_values.reshape((b * f,) + pixel_values.shape[2:])
            out = self.vision(frames, deterministic=deterministic)
            cls = out["pooler_output"].reshape(b, f, -1)
            return self.visual_proj(cls)
        return super().encode_image(pixel_values, deterministic)


class CLIPGPTFrameTextGeneration(CLIPGPTImageTextGeneration):
    def sample_inputs(self):
        vc = self.config.vision_config
        return {"pixel_values": jnp.ones(
            (1, 2, vc.image_size, vc.image_size, 3), jnp.float32),
            "input_ids": jnp.ones((1, 6), jnp.int32)}

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return CLIPGPTFrameTextModule(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        vc = config.vision_config
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            pixel_values=jnp.ones((1, 2, vc.image_size, vc.image_size, 3),
                                  jnp.float32),
            input_ids=jnp.ones((1, 6), jnp.int32),
            deterministic=True)
        return nn.unbox(variables["params"])
