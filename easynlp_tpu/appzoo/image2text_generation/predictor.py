"""Image→text predictor (reference easynlp/appzoo/image2text_generation/
predictor.py:147-245 — decode base64 image(s), generate caption token ids,
detokenize to 'gen_text')."""

import jax
import numpy as np

from easynlp_tpu.core.predictor import Predictor
from easynlp_tpu.data.image_utils import (
    decode_base64_image_urlsafe,
    preprocess_image,
)


class ImageTextGenerationPredictor(Predictor):
    frame_input = False

    def __init__(self, model_dir, app, first_sequence="imgbase64",
                 second_sequence=None, sequence_length=32, batch_size=8,
                 user_defined_parameters=None, **_):
        from easynlp_tpu.appzoo.api import _tokenizer_for
        udp = user_defined_parameters or {}
        self.tokenizer = _tokenizer_for(model_dir)
        self.app = app
        self.image_col = first_sequence or "imgbase64"
        vc = getattr(app.config, "vision_config", None)
        default_size = vc.image_size if vc is not None else \
            2 ** (len(app.config.vq_channel_mult) - 1) * 4
        self.image_size = int(udp.get("img_size",
                                      udp.get("size", default_size)))
        self.text_len = int(udp.get("text_len", sequence_length or 32))
        self.frame_num = int(udp.get("frame_num", 3))
        self.num_beams = int(udp.get("num_beams", 1))
        self.do_sample = bool(int(udp.get("do_sample", 0)))
        self.top_k = int(udp.get("top_k", 0))
        self.batch_size = batch_size
        vocab = self.tokenizer.vocab if hasattr(self.tokenizer, "vocab") else {}
        self.bos_id = vocab.get("[CLS]", 101)
        self.eos_id = vocab.get("[SEP]", 102)
        self._rng = jax.random.PRNGKey(int(udp.get("seed", 0)))

    def _decode_cell(self, cell):
        # VQGAN-variant apps (no vision tower) take [-1, 1] pixels
        pm1 = getattr(self.app.config, "vision_config", None) is None
        if pm1:
            from easynlp_tpu.data.image_utils import preprocess_image_pm1
            pre = lambda img: preprocess_image_pm1(img, self.image_size)
        else:
            pre = lambda img: preprocess_image(img, self.image_size)
        if self.frame_input:
            from easynlp_tpu.data.image_utils import decode_frame_list
            frames, _ = decode_frame_list(cell, self.frame_num)
            return np.stack([pre(f) for f in frames])
        return pre(decode_base64_image_urlsafe(cell))

    def preprocess(self, in_data):
        out = dict(in_data)
        out["pixel_values"] = np.stack(
            [self._decode_cell(str(c)) for c in in_data[self.image_col]]
        ).astype(np.float32)
        return out

    def predict(self, in_data):
        pv = in_data["pixel_values"]
        n, bs = len(pv), self.batch_size
        seqs = []
        for start in range(0, n, bs):
            chunk = pv[start:start + bs]
            real = len(chunk)
            if real < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - real, 0)])
            self._rng, sub = jax.random.split(self._rng)
            out = self.app.generate(
                chunk, max_length=self.text_len, bos_token_id=self.bos_id,
                eos_token_id=self.eos_id, num_beams=self.num_beams,
                do_sample=self.do_sample, top_k=self.top_k, rng=sub)
            seqs.append(np.asarray(jax.device_get(out))[:real])
        result = dict(in_data)
        result["generated_ids"] = np.concatenate(seqs)
        result.pop("pixel_values", None)
        return result

    def postprocess(self, result):
        texts = []
        for row in result["generated_ids"]:
            ids = [int(t) for t in row
                   if int(t) not in (self.bos_id, self.eos_id, 0)]
            texts.append(self.tokenizer.decode(ids)
                         if hasattr(self.tokenizer, "decode")
                         else " ".join(map(str, ids)))
        result["gen_text"] = texts
        result["predictions"] = texts
        result["generated_ids"] = [" ".join(str(int(x)) for x in row)
                                   for row in result["generated_ids"]]
        return result
