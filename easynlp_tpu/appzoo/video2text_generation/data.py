"""Video→text (frame captioning) dataset.

Capability parity: reference easynlp/appzoo/video2text_generation/data.py:
143-188 — rows 'json-list-of-base64-frames<TAB>caption'; frame_num frames
taken from the head of the list (or a frame directory), each through the
CLIP transform; caption tokenised to text_len."""

import numpy as np

from easynlp_tpu.appzoo.image2text_generation.data import ImageTextDataset
from easynlp_tpu.data.image_utils import decode_frame_list, preprocess_image


class FrameTextDataset(ImageTextDataset):
    def __init__(self, *args, user_defined_parameters=None, **kwargs):
        udp = user_defined_parameters or {}
        self.frame_num = int(udp.get("frame_num", 3))
        super().__init__(*args, user_defined_parameters=udp, **kwargs)

    def decode_image(self, idx):
        frames, _ = decode_frame_list(self._image_b64(idx), self.frame_num)
        return np.stack([preprocess_image(f, self.image_size)
                         for f in frames]).astype(np.float32)
