"""Text→image generation dataset.

Capability parity: reference easynlp/appzoo/text2image_generation/data.py:
32-127 — rows 'text<TAB>urlsafe-base64 image'; text tokenised and padded to
text_len, image rescaled (short side) + center/random-cropped to `size` and
scaled to [-1, 1]. The reference offsets *text* ids by img_vocab_size to build
the joint vocab (data.py:112); our ARTIST places image codes *after* the text
vocab instead (modelzoo/models/artist/modeling_artist.py:182-184), so text
ids feed the GPT unshifted — same joint sequence, TPU-friendlier embedding
table layout (text rows first, shared with the tokenizer)."""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset
from easynlp_tpu.data.image_utils import (
    decode_base64_image_urlsafe,
    preprocess_image_pm1,
)


class TextImageDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=32,
                 input_schema=None, first_sequence="text",
                 second_sequence="imgbase64", user_defined_parameters=None,
                 is_training=False, **kwargs):
        for k in ("label_name", "label_enumerate_values", "multi_label",
                  "image_size"):
            kwargs.pop(k, None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        udp = user_defined_parameters or {}
        self.tokenizer = tokenizer
        self.size = int(udp.get("size", 256))
        self.random_crop = bool(udp.get("random_crop", False)) and is_training
        self.text_len = int(udp.get("text_len", max_seq_length or 32))
        self.text_col = first_sequence or "text"
        self.image_col = second_sequence or "imgbase64"
        # captions materialised for one-pass tokenisation; base64 image
        # payloads stay on disk behind the lazy row view (parsed per item)
        texts = [str(self.parse_row(row).get(self.text_col, ""))
                 for row in self.rows]
        enc = self.tokenizer(texts, max_length=self.text_len)
        self.input_ids = np.asarray(enc["input_ids"], np.int32)
        self.attention_mask = np.asarray(enc["attention_mask"], np.int32)
        self._rng = np.random.RandomState(0)

    def _image_b64(self, idx):
        return str(self.parse_row(self.rows[idx]).get(self.image_col, ""))

    def __getitem__(self, idx):
        img = preprocess_image_pm1(
            decode_base64_image_urlsafe(self._image_b64(idx)), self.size,
            random_crop=self.random_crop, rng=self._rng)
        return {"input_ids": self.input_ids[idx],
                "attention_mask": self.attention_mask[idx],
                "pixel_values": img.astype(np.float32)}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
