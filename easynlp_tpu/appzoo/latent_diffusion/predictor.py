"""Latent-diffusion predictor: prompt text → base64 PNG (reference
easynlp/appzoo/latent_diffusion/predictor.py — tokenize prompts, DDIM+CFG
sample, emit base64 images).

UDP decode knobs: n_samples (images per prompt), num_steps, guidance_scale,
negative_prompt, sampler (ddim|plms|dpm++), seed, do_upscale (ESRGAN when
flax_params_esrgan.msgpack is present in the model dir)."""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.core.predictor import Predictor
from easynlp_tpu.data.image_utils import encode_image_base64_png


class LDMPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence="text",
                 second_sequence=None, sequence_length=32, batch_size=4,
                 user_defined_parameters=None, **_):
        from easynlp_tpu.appzoo.api import _tokenizer_for
        udp = user_defined_parameters or {}
        self.tokenizer = _tokenizer_for(model_dir)
        self.app = app
        self.text_col = first_sequence or "text"
        self.text_len = int(udp.get("text_len", sequence_length or 32))
        self.num_steps = int(udp.get("num_steps", 50))
        self.guidance_scale = float(udp.get("guidance_scale", 7.5))
        self.method = str(udp.get("sampler", "ddim"))
        self.n_samples = int(udp.get("n_samples", 1))
        self.negative_prompt = udp.get("negative_prompt") or None
        self.batch_size = batch_size
        self._rng = jax.random.PRNGKey(int(udp.get("seed", 0)))

    def preprocess(self, in_data):
        texts = [str(t) for t in in_data[self.text_col]]
        enc = self.tokenizer(texts, max_length=self.text_len)
        out = dict(in_data)
        out["input_ids"] = np.asarray(enc["input_ids"], np.int32)
        out["attention_mask"] = np.asarray(enc["attention_mask"], np.int32)
        if self.negative_prompt:
            neg = self.tokenizer([self.negative_prompt] * len(texts),
                                 max_length=self.text_len)
            out["negative_input_ids"] = np.asarray(neg["input_ids"],
                                                   np.int32)
        return out

    def predict(self, in_data):
        ids = in_data["input_ids"]
        mask = in_data["attention_mask"]
        neg = in_data.get("negative_input_ids")
        n, bs = len(ids), self.batch_size
        images = [[] for _ in range(self.n_samples)]
        for start in range(0, n, bs):
            c_ids, c_mask = ids[start:start + bs], mask[start:start + bs]
            c_neg = neg[start:start + bs] if neg is not None else None
            real = len(c_ids)
            if real < bs:  # pad to the static batch shape
                rep = bs - real
                c_ids = np.concatenate([c_ids, np.repeat(c_ids[-1:], rep, 0)])
                c_mask = np.concatenate(
                    [c_mask, np.repeat(c_mask[-1:], rep, 0)])
                if c_neg is not None:
                    c_neg = np.concatenate(
                        [c_neg, np.repeat(c_neg[-1:], rep, 0)])
            for g in range(self.n_samples):
                self._rng, sub = jax.random.split(self._rng)
                imgs = jax.device_get(self.app.sample(
                    jnp.asarray(c_ids), jnp.asarray(c_mask),
                    num_steps=self.num_steps,
                    guidance_scale=self.guidance_scale,
                    rng=sub, method=self.method,
                    negative_input_ids=(jnp.asarray(c_neg)
                                        if c_neg is not None else None)))
                images[g].extend(list(np.asarray(imgs)[:real]))
        result = dict(in_data)
        result["gen_images"] = images
        return result

    def postprocess(self, result):
        result = dict(result)
        images = result.pop("gen_images")
        b64 = [",".join(encode_image_base64_png(images[g][i])
                        for g in range(self.n_samples))
               for i in range(len(images[0]))]
        result["predictions"] = b64
        result["gen_imgbase64"] = b64
        return result
