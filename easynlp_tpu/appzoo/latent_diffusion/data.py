"""Latent diffusion dataset (capability parity: reference
easynlp/appzoo/latent_diffusion/ — text + base64 image rows; pixels scaled to
[-1, 1] for the VAE).

ControlNet training can take a precomputed conditioning map per row (e.g. a
depth map — the reference webui's second control mode next to canny) via
`controlnet_hint_column=<colname>` in user_defined_parameters: that column's
base64 image is decoded with the same resize/center-crop and emitted as
`hint_values` in [0, 1]; without it the hint is derived in-graph from the
training image (edge map)."""

import numpy as np

from easynlp_tpu.appzoo.clip.data import CLIPDataset
from easynlp_tpu.data.image_utils import decode_base64_image


def _square(img, size):
    from PIL import Image
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    return img.crop((left, top, left + size, top + size))


class LDMDataset(CLIPDataset):
    def __init__(self, *args, **kwargs):
        udp = kwargs.get("user_defined_parameters") or {}
        hint_col = kwargs.pop("hint_column", None) or \
            udp.get("controlnet_hint_column")
        super().__init__(*args, **kwargs)
        self._hint_col = hint_col or None
        if hint_col and self.schema is None:
            raise ValueError(
                "controlnet_hint_column requires TSV input (webdataset "
                "tars carry no extra columns)")

    def __getitem__(self, idx):
        # base64 payloads are re-parsed from the lazy row view per item —
        # the multi-GB image columns never live in host RAM
        img = _square(self._decode(idx), self.image_size)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0  # [-1, 1]
        out = {k: v[idx] for k, v in self.text_features.items()}
        out["pixel_values"] = arr
        if self._hint_col is not None:
            b64 = str(self.parse_row(self.rows[idx]).get(self._hint_col, ""))
            hint = _square(decode_base64_image(b64), self.image_size)
            out["hint_values"] = np.asarray(hint, np.float32) / 255.0
        return out
