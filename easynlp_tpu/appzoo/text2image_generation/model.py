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

    def generate(self, input_ids, attention_mask=None, do_sample=True,
                 top_k=100, temperature=1.0, num_beams=1, rng=None):
        """Sample image codes conditioned on text ids (reference
        text2image_generation/model.py:300-380 — top-k sampling restricted to
        the image-code vocabulary). Returns int32 codes [B, image_token_len].
        """
        import numpy as np

        from easynlp_tpu.modelzoo.generation_utils import generate
        from easynlp_tpu.modelzoo.models.artist.generation import (
            make_artist_generation_fns)
        c = self.config
        b, p = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, p), jnp.int32)
        max_length = p + c.image_token_length
        prefill, decode = make_artist_generation_fns(self.module, max_length)
        # image codes live at [text_vocab, text_vocab + image_vocab): mask
        # everything else out of the sampling distribution
        v = c.gpt_config.vocab_size
        bad = np.ones((b, v), bool)
        bad[:, c.text_vocab_size:c.text_vocab_size + c.image_vocab_size] = \
            False
        if num_beams > 1:
            bad = np.repeat(bad, num_beams, axis=0)
        seqs = generate(
            prefill, decode, self.params, jnp.asarray(input_ids),
            jnp.asarray(attention_mask), max_length=max_length,
            num_beams=num_beams, do_sample=do_sample, top_k=top_k,
            temperature=temperature, eos_token_id=None, pad_token_id=0,
            bad_words_mask=jnp.asarray(bad), rng=rng)
        codes = jnp.asarray(seqs)[:, p:] - c.text_vocab_size
        return jnp.clip(codes, 0, c.image_vocab_size - 1)

    def decode_images(self, codes):
        """Image codes [B, L] → pixels [-1, 1] [B, H, W, 3] via the VQGAN
        decoder (reference model.py decode_to_img)."""
        from easynlp_tpu.modelzoo.models.artist.modeling_artist import (
            ARTISTModel)
        b, length = codes.shape
        side = int(round(length ** 0.5))
        grid = jnp.asarray(codes).reshape(b, side, side)
        return self.module.apply({"params": self.params}, grid,
                                 method=ARTISTModel.decode_codes)

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
