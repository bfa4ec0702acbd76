"""Host-side image preprocessing for CLIP-family models.

Capability parity: reference easynlp/appzoo/clip/data.py:29-135 — base64
decode → BICUBIC resize (short side to image_size) → center crop → CHW
normalise with CLIP mean/std. Output here is HWC float32 (TPU conv/matmul
layout); the patchify matmul happens on device (modeling_clip.ViTEncoder).
"""

import base64
import io as _io

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_base64_image(b64):
    from PIL import Image
    data = base64.b64decode(b64)
    return Image.open(_io.BytesIO(data)).convert("RGB")


def preprocess_image(img, image_size=224, mean=CLIP_MEAN, std=CLIP_STD):
    """PIL image → normalised HWC float32 [image_size, image_size, 3]."""
    from PIL import Image
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - mean) / std


def preprocess_base64_batch(b64_list, image_size=224):
    return np.stack([preprocess_image(decode_base64_image(b), image_size)
                     for b in b64_list])
