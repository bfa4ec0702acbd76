"""Text↔video retrieval predictor (reference easynlp/appzoo/
text2video_retrieval/predictor.py — text and/or video → embeddings)."""

import jax
import numpy as np

from easynlp_tpu.core.predictor import Predictor
from easynlp_tpu.data.image_utils import decode_frame_list, preprocess_image


class Text2VideoRetrievalPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence="text",
                 second_sequence=None, sequence_length=32, batch_size=8,
                 user_defined_parameters=None, **_):
        from easynlp_tpu.appzoo.api import _tokenizer_for
        udp = user_defined_parameters or {}
        self.tokenizer = _tokenizer_for(model_dir)
        self.app = app
        self.text_col = first_sequence or "text"
        self.video_col = second_sequence
        self.sequence_length = sequence_length
        self.image_size = app.config.vision_config.image_size
        self.max_frames = int(udp.get("max_frames",
                                      udp.get("frame_num", 12)))
        self.batch_size = batch_size
        self._fwd = None

    def preprocess(self, in_data):
        out = dict(in_data)
        enc = self.tokenizer([str(t) for t in in_data[self.text_col]],
                             max_length=self.sequence_length)
        out.update({k: np.asarray(v, np.int32) for k, v in enc.items()})
        if self.video_col and self.video_col in in_data:
            pixels, masks = [], []
            for cell in in_data[self.video_col]:
                frames, n_real = decode_frame_list(str(cell), self.max_frames)
                pixels.append(np.stack(
                    [preprocess_image(f, self.image_size) for f in frames]))
                m = np.zeros((self.max_frames,), np.int32)
                m[:n_real] = 1
                masks.append(m)
            out["pixel_values"] = np.stack(pixels).astype(np.float32)
            out["video_masks"] = np.stack(masks)
        return out

    def predict(self, in_data):
        keys = [k for k in ("input_ids", "attention_mask", "token_type_ids",
                            "pixel_values", "video_masks") if k in in_data]
        if self._fwd is None:
            module = self.app.module

            def fwd(params, batch):
                return module.apply({"params": params},
                                    **{k: batch[k] for k in keys},
                                    deterministic=True)
            self._fwd = jax.jit(fwd)
        n, bs = len(in_data["input_ids"]), self.batch_size
        outs = []
        for start in range(0, n, bs):
            chunk = {k: np.asarray(in_data[k])[start:start + bs]
                     for k in keys}
            real = len(chunk["input_ids"])
            if real < bs:
                chunk = {k: np.concatenate(
                    [v, np.repeat(v[-1:], bs - real, 0)])
                    for k, v in chunk.items()}
            res = jax.device_get(self._fwd(self.app.params, chunk))
            outs.append({k: np.asarray(v)[:real] for k, v in res.items()
                         if k in ("text_embeds", "video_embeds")})
        merged = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        merged.update(in_data)
        return merged

    def postprocess(self, result):
        result = dict(result)
        for key in ("text_embeds", "video_embeds"):
            if key in result:
                result[key] = [" ".join("%.8f" % x for x in row)
                               for row in np.asarray(result[key])]
        result["predictions"] = result.get("text_embeds", [])
        return result
