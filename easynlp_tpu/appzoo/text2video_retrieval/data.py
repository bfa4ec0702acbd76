"""Text↔video retrieval dataset (CLIP4Clip).

Capability parity: reference easynlp/appzoo/text2video_retrieval/data.py:
180-260 — rows 'text<TAB>video'; the video cell is a directory of frame
images or a JSON list of base64 frames, padded with black frames to
max_frames with a video_mask marking real frames; text through the CLIP
tokenizer path."""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset
from easynlp_tpu.data.image_utils import decode_frame_list, preprocess_image


class Text2VideoRetrievalDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=32,
                 input_schema=None, first_sequence="text",
                 second_sequence="video", image_size=224,
                 user_defined_parameters=None, **kwargs):
        for k in ("label_name", "label_enumerate_values", "multi_label",
                  "is_training"):
            kwargs.pop(k, None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        udp = user_defined_parameters or {}
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.text_col = first_sequence or "text"
        self.video_col = second_sequence or "video"
        self.image_size = int(udp.get("img_size", image_size))
        self.max_frames = int(udp.get("max_frames",
                                      udp.get("frame_num", 12)))
        # captions materialised for one-pass tokenisation; base64 frame
        # payloads stay on disk behind the lazy row view (parsed per item)
        texts = [str(self.parse_row(row).get(self.text_col, ""))
                 for row in self.rows]
        enc = self.tokenizer(texts, max_length=max_seq_length)
        self.text_features = {k: np.asarray(v, np.int32)
                              for k, v in enc.items()}

    def _video_b64(self, idx):
        return str(self.parse_row(self.rows[idx]).get(self.video_col, ""))

    def __getitem__(self, idx):
        frames, n_real = decode_frame_list(self._video_b64(idx),
                                           self.max_frames)
        pixels = np.stack([preprocess_image(f, self.image_size)
                           for f in frames]).astype(np.float32)
        mask = np.zeros((self.max_frames,), np.int32)
        mask[:n_real] = 1
        out = {k: v[idx] for k, v in self.text_features.items()}
        out["pixel_values"] = pixels
        out["video_masks"] = mask
        return out

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
