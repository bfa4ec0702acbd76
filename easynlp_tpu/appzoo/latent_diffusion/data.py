"""Latent diffusion dataset (capability parity: reference
easynlp/appzoo/latent_diffusion/ — text + base64 image rows; pixels scaled to
[-1, 1] for the VAE)."""

import numpy as np

from easynlp_tpu.appzoo.clip.data import CLIPDataset
from easynlp_tpu.data.image_utils import decode_base64_image


class LDMDataset(CLIPDataset):
    def __getitem__(self, idx):
        from PIL import Image
        img = decode_base64_image(self._images_b64[idx])
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))),
                         Image.BICUBIC)
        w, h = img.size
        left, top = (w - self.image_size) // 2, (h - self.image_size) // 2
        img = img.crop((left, top, left + self.image_size,
                        top + self.image_size))
        arr = np.asarray(img, np.float32) / 127.5 - 1.0  # [-1, 1]
        out = {k: v[idx] for k, v in self.text_features.items()}
        out["pixel_values"] = arr
        return out
