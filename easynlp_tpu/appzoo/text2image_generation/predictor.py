"""Text→image predictor (reference easynlp/appzoo/text2image_generation/
predictor.py:38-140 — tokenize text, sample image codes, VQGAN-decode,
emit base64 PNG under 'gen_imgbase64')."""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.core.predictor import Predictor
from easynlp_tpu.data.image_utils import encode_image_base64_png


class TextImageGenerationPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence="text",
                 second_sequence=None, sequence_length=32, batch_size=8,
                 user_defined_parameters=None, **_):
        from easynlp_tpu.appzoo.api import _tokenizer_for
        udp = user_defined_parameters or {}
        self.tokenizer = _tokenizer_for(model_dir)
        self.app = app
        self.text_col = first_sequence or "text"
        self.text_len = int(udp.get("text_len", sequence_length or 32))
        self.top_k = int(udp.get("top_k", 100))
        self.temperature = float(udp.get("temperature", 1.0))
        self.max_generated_num = int(udp.get("max_generated_num", 1))
        self.batch_size = batch_size
        self._rng = jax.random.PRNGKey(int(udp.get("seed", 0)))

    def preprocess(self, in_data):
        enc = self.tokenizer([str(t) for t in in_data[self.text_col]],
                             max_length=self.text_len)
        out = dict(in_data)
        out["input_ids"] = np.asarray(enc["input_ids"], np.int32)
        out["attention_mask"] = np.asarray(enc["attention_mask"], np.int32)
        return out

    def predict(self, in_data):
        ids = in_data["input_ids"]
        mask = in_data["attention_mask"]
        n, bs = len(ids), self.batch_size
        images = [[] for _ in range(self.max_generated_num)]
        for start in range(0, n, bs):
            chunk_ids = ids[start:start + bs]
            chunk_mask = mask[start:start + bs]
            real = len(chunk_ids)
            if real < bs:  # pad to the static batch shape
                chunk_ids = np.concatenate(
                    [chunk_ids, np.repeat(chunk_ids[-1:], bs - real, 0)])
                chunk_mask = np.concatenate(
                    [chunk_mask, np.repeat(chunk_mask[-1:], bs - real, 0)])
            for g in range(self.max_generated_num):
                self._rng, sub = jax.random.split(self._rng)
                codes = self.app.generate(
                    jnp.asarray(chunk_ids), jnp.asarray(chunk_mask),
                    do_sample=True, top_k=self.top_k,
                    temperature=self.temperature, rng=sub)
                pixels = jax.device_get(self.app.decode_images(codes))
                images[g].extend(list(np.asarray(pixels)[:real]))
        result = dict(in_data)
        result["gen_images"] = images
        return result

    def postprocess(self, result):
        images = result.pop("gen_images")
        b64 = [
            "\x02".join(encode_image_base64_png(images[g][i])
                        for g in range(len(images)))
            for i in range(len(images[0]))
        ]
        result["gen_imgbase64"] = b64
        result["predictions"] = b64
        return result
