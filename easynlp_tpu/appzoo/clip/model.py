"""CLIP retrieval application (capability parity: reference
easynlp/appzoo/clip/model.py:40-162 — dual tower + in-batch symmetric
contrastive clip_loss)."""

import jax.numpy as jnp

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.models.clip import CLIPConfig, CLIPModel
from easynlp_tpu.utils import losses


class CLIPApp(Application):
    model_input_keys = ("input_ids", "attention_mask", "token_type_ids",
                        "pixel_values")

    def sample_inputs(self):
        vc = self.config.vision_config
        return {"input_ids": jnp.ones((1, 8), jnp.int32),
                "pixel_values": jnp.ones(
                    (1, vc.image_size, vc.image_size, 3), jnp.float32)}

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.clip_contrastive_loss(
            outputs["logits_per_text"])}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return CLIPConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return CLIPModel(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        import jax
        from flax import linen as nn
        vc = config.vision_config
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            input_ids=jnp.ones((1, 8), jnp.int32),
            pixel_values=jnp.ones((1, vc.image_size, vc.image_size, 3),
                                  jnp.float32),
            deterministic=True)
        return nn.unbox(variables["params"])

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        from easynlp_tpu.modelzoo.models.clip.conversion import (
            convert_chinese_clip)
        return convert_chinese_clip(state_dict, config)
