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
        self._hints_b64 = None
        if hint_col:
            if self.schema is None:
                raise ValueError(
                    "controlnet_hint_column requires TSV input (webdataset "
                    "tars carry no extra columns)")
            self._hints_b64 = [str(self.parse_row(r).get(hint_col, ""))
                               for r in self.rows]

    def __getitem__(self, idx):
        img = _square(decode_base64_image(self._images_b64[idx]),
                      self.image_size)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0  # [-1, 1]
        out = {k: v[idx] for k, v in self.text_features.items()}
        out["pixel_values"] = arr
        if self._hints_b64 is not None:
            hint = _square(decode_base64_image(self._hints_b64[idx]),
                           self.image_size)
            out["hint_values"] = np.asarray(hint, np.float32) / 255.0
        return out
