"""Text → image generation (ARTIST).

Capability parity: reference easynlp/appzoo/text2image_generation/model.py
:15,333 — GPT over VQGAN image tokens conditioned on text tokens; training =
LM loss over the image-code segment (+ VQ losses when training the VQGAN
end-to-end); sampling = decode image codes autoregressively, then VQGAN-decode
to pixels.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.models.artist import ARTISTConfig, ARTISTModel
from easynlp_tpu.utils import losses


class TextImageGeneration(Application):
    model_input_keys = ("input_ids", "pixel_values", "attention_mask")

    def sample_inputs(self):
        c = self.config
        side = 2 ** (len(c.vq_channel_mult) - 1) * 4
        return {"input_ids": jnp.ones((1, 6), jnp.int32),
                "pixel_values": jnp.ones((1, side, side, 3), jnp.float32)}

    @staticmethod
    def loss_fn(outputs, batch):
        """Next-token LM loss over the image-code positions + VQ loss."""
        logits = outputs["logits"][:, :-1]
        targets = outputs["sequence"][:, 1:]
        text_len = batch["input_ids"].shape[1]
        # only supervise image-code predictions (positions >= text_len - 1)
        pos = jnp.arange(targets.shape[1])[None, :]
        labels = jnp.where(pos >= text_len - 1, targets, -100)
        lm = losses.cross_entropy(logits, labels, ignore_index=-100)
        return {"loss": lm + outputs["vq_loss"], "lm_loss": lm,
                "vq_loss": outputs["vq_loss"]}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return ARTISTConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return ARTISTModel(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        side = 2 ** (len(config.vq_channel_mult) - 1) * 4
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            input_ids=jnp.ones((1, 6), jnp.int32),
            pixel_values=jnp.ones((1, side, side, 3), jnp.float32),
            deterministic=True)
        return nn.unbox(variables["params"])
