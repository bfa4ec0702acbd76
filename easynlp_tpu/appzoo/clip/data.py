"""CLIP dataset (capability parity: reference easynlp/appzoo/clip/data.py —
TSV rows 'text<TAB>base64image' (:254); images decoded+resized+normalised on
the host, patchified on device)."""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset
from easynlp_tpu.data.image_utils import (
    decode_base64_image,
    preprocess_image,
)


class CLIPDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=32,
                 input_schema=None, first_sequence="text",
                 second_sequence="image", image_size=224, **kwargs):
        for k in ("label_name", "label_enumerate_values", "multi_label"):
            kwargs.pop(k, None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.text_col = first_sequence or "text"
        self.image_col = second_sequence or "image"
        self.image_size = image_size
        texts, self._images_b64 = [], []
        for row in self.rows:
            r = self.parse_row(row)
            texts.append(str(r.get(self.text_col, "")))
            self._images_b64.append(str(r.get(self.image_col, "")))
        enc = self.tokenizer(texts, max_length=max_seq_length)
        self.text_features = {k: np.asarray(v, np.int32)
                              for k, v in enc.items()}

    def __getitem__(self, idx):
        # images decoded lazily (large); text features are precomputed
        img = preprocess_image(decode_base64_image(self._images_b64[idx]),
                               self.image_size)
        out = {k: v[idx] for k, v in self.text_features.items()}
        out["pixel_values"] = img.astype(np.float32)
        return out

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
