"""Image→text generation, VQGAN variant (mingpt_i2t).

Capability parity: reference easynlp/modelzoo/models/mingpt_i2t +
appzoo/image2text_generation vqgan.py (api.py:127-131 dispatches
enable_vqgan): the image is tokenised into VQGAN codes, a GPT runs over the
joint [image codes; caption tokens] vocabulary, the caption decodes
autoregressively after the code prefix. TPU shape: reuses the ARTIST tower
(same VQGAN + joint-vocab GPT — ARTIST is text→image, this is its mirror)
with sequence order [image; text] and the LM loss on the text segment."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.appzoo.image2text_generation.data import ImageTextDataset
from easynlp_tpu.data.image_utils import (
    decode_base64_image_urlsafe,
    preprocess_image_pm1,
)
from easynlp_tpu.modelzoo.models.artist import ARTISTConfig, ARTISTModel
from easynlp_tpu.utils import losses


class VQGANGPTImageTextGeneration(Application):
    """ARTIST tower, [image codes; caption] order, caption-side loss."""

    model_input_keys = ("input_ids", "pixel_values", "attention_mask")

    def sample_inputs(self):
        c = self.config
        side = 2 ** (len(c.vq_channel_mult) - 1) * 4
        return {"input_ids": jnp.ones((1, 6), jnp.int32),
                "pixel_values": jnp.ones((1, side, side, 3), jnp.float32)}

    @staticmethod
    def loss_fn(outputs, batch):
        """Next-token loss over the caption segment of [codes; text]."""
        logits = outputs["logits"][:, :-1]
        targets = outputs["sequence"][:, 1:]
        img_len = outputs["sequence"].shape[1] - batch["input_ids"].shape[1]
        pos = jnp.arange(targets.shape[1])[None, :]
        labels = jnp.where(pos >= img_len - 1, targets, -100)
        if "attention_mask" in batch:
            # target at sequence position p >= img_len is the text token
            # attention_mask[p - img_len]; image-segment targets stay valid
            head = jnp.ones((labels.shape[0], img_len - 1), bool)
            labels = jnp.where(
                jnp.concatenate([head, batch["attention_mask"] > 0], 1),
                labels, -100)
        lm = losses.cross_entropy(logits, labels, ignore_index=-100)
        return {"loss": lm + outputs["vq_loss"], "lm_loss": lm,
                "vq_loss": outputs["vq_loss"]}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return ARTISTConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return ARTISTModel(config=config, dtype=dtype, remat=remat,
                           image_first=True)

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

    # -- generation ------------------------------------------------------
    def tokenize_images(self, pixel_values):
        codes, _, _ = self.module.apply(
            {"params": self.params}, jnp.asarray(pixel_values),
            method=ARTISTModel.tokenize_image)
        return codes.reshape(pixel_values.shape[0], -1)

    def generate(self, pixel_values, max_length=32, bos_token_id=101,
                 eos_token_id=102, pad_token_id=0, num_beams=1,
                 do_sample=False, top_k=0, temperature=1.0, rng=None):
        """Caption after the image-code prefix (reference mingpt_i2t
        sample): prompt = [codes + text_vocab; bos], decode restricted to
        the text vocabulary."""
        from easynlp_tpu.modelzoo.generation_utils import generate
        from easynlp_tpu.modelzoo.models.artist.generation import (
            make_artist_generation_fns)
        c = self.config
        codes = self.tokenize_images(pixel_values)
        b, lcodes = codes.shape
        prompt = jnp.concatenate(
            [codes.astype(jnp.int32) + c.text_vocab_size,
             jnp.full((b, 1), bos_token_id, jnp.int32)], axis=1)
        mask = jnp.ones_like(prompt)
        total = prompt.shape[1] + max_length
        prefill, decode = make_artist_generation_fns(self.module, total)
        v = c.gpt_config.vocab_size
        bad = np.zeros((b, v), bool)
        bad[:, c.text_vocab_size:] = True   # image codes are not words
        if num_beams > 1:
            bad = np.repeat(bad, num_beams, axis=0)
        seqs = generate(prefill, decode, self.params, prompt, mask,
                        max_length=total, num_beams=num_beams,
                        do_sample=do_sample, top_k=top_k,
                        temperature=temperature, eos_token_id=eos_token_id,
                        pad_token_id=pad_token_id,
                        bad_words_mask=jnp.asarray(bad), rng=rng)
        return jnp.asarray(seqs)[:, prompt.shape[1] - 1:]


class VQGANImageTextDataset(ImageTextDataset):
    """i2t rows with VQGAN pixel scaling: [-1, 1] crop at the VQGAN input
    size (reference image2text_generation/data.py vqgan branch)."""

    def __init__(self, *args, user_defined_parameters=None, **kwargs):
        udp = dict(user_defined_parameters or {})
        self.vq_size = int(udp.get("size", udp.get("img_size", 256)))
        super().__init__(*args, user_defined_parameters=udp, **kwargs)

    def decode_image(self, idx):
        return preprocess_image_pm1(
            decode_base64_image_urlsafe(self._image_b64(idx)),
            self.vq_size).astype(np.float32)
