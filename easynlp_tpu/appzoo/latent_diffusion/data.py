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
from easynlp_tpu.data.image_utils import (decode_base64_image,
                                          preprocess_image_pm1)


class LDMDataset(CLIPDataset):
    def __init__(self, *args, **kwargs):
        udp = kwargs.get("user_defined_parameters") or {}
        hint_col = kwargs.pop("hint_column", None) or \
            udp.get("controlnet_hint_column")
        super().__init__(*args, **kwargs)
        self._hint_col = hint_col or None
        if hint_col and self.schema is None:
            raise ValueError(
                "controlnet_hint_column needs schema'd TSV rows: pass "
                "--input_schema naming the hint column (webdataset tars "
                "carry no extra columns, so they cannot provide one)")

    def __getitem__(self, idx):
        # base64 payloads are re-parsed from the lazy row view per item —
        # the multi-GB image columns never live in host RAM
        arr = preprocess_image_pm1(self._decode(idx), self.image_size)
        out = {k: v[idx] for k, v in self.text_features.items()}
        out["pixel_values"] = arr.astype(np.float32)
        if self._hint_col is not None:
            b64 = str(self.parse_row(self.rows[idx]).get(self._hint_col, ""))
            hint = preprocess_image_pm1(decode_base64_image(b64),
                                        self.image_size)
            out["hint_values"] = ((hint.astype(np.float32) + 1.0) / 2.0)
        return out
