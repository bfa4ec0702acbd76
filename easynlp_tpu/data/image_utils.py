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
    try:
        data = base64.b64decode(b64, validate=True)
    except Exception:
        data = base64.urlsafe_b64decode(b64)
    return Image.open(_io.BytesIO(data)).convert("RGB")


def resize_center_crop(img, image_size=224):
    """PIL image → uint8 HWC [image_size, image_size, 3] (BICUBIC short-side
    resize + center crop). Split out of preprocess_image so datasets can
    cache the decoded/resized uint8 (4x smaller than float32) and pay only
    the vectorised normalisation per epoch."""
    from PIL import Image
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    return np.asarray(img, np.uint8)


def normalize_clip_u8(u8, mean=CLIP_MEAN, std=CLIP_STD):
    """uint8 HWC → CLIP-normalised float32 HWC."""
    return (u8.astype(np.float32) / 255.0 - mean) / std


def preprocess_image(img, image_size=224, mean=CLIP_MEAN, std=CLIP_STD):
    """PIL image → normalised HWC float32 [image_size, image_size, 3]."""
    return normalize_clip_u8(resize_center_crop(img, image_size), mean, std)


def preprocess_base64_batch(b64_list, image_size=224, mean=None, std=None):
    mean = CLIP_MEAN if mean is None else np.asarray(mean, np.float32)
    std = CLIP_STD if std is None else np.asarray(std, np.float32)
    return np.stack([preprocess_image(decode_base64_image(b), image_size,
                                      mean, std)
                     for b in b64_list])


def decode_base64_image_urlsafe(b64):
    """Reference vision-generation apps use urlsafe base64 (reference
    easynlp/appzoo/text2image_generation/data.py:115); accept either
    alphabet."""
    from PIL import Image
    try:
        data = base64.urlsafe_b64decode(b64)
    except Exception:
        data = base64.b64decode(b64)
    return Image.open(_io.BytesIO(data)).convert("RGB")


def preprocess_image_pm1(img, image_size=256, random_crop=False, rng=None):
    """PIL image → HWC float32 in [-1, 1] (reference text2image data.py:
    114-118 — SmallestMaxSize rescale + center/random crop + /127.5 - 1)."""
    from PIL import Image
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    if random_crop and (w > image_size or h > image_size):
        rng = rng or np.random
        left = rng.randint(0, w - image_size + 1)
        top = rng.randint(0, h - image_size + 1)
    else:
        left = (w - image_size) // 2
        top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, np.float32)
    return arr / 127.5 - 1.0


def encode_image_base64_png(pixels_pm1):
    """HWC float array in [-1, 1] → base64 PNG string (reference
    text2image_generation/predictor.py:save_image)."""
    from PIL import Image
    arr = ((np.asarray(pixels_pm1, np.float32) + 1.0) * 127.5)
    arr = arr.clip(0, 255).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("utf-8")


def decode_frame_list(value, max_frames, decode_fn=None):
    """A video cell is either a JSON list of base64 frames (reference
    video2text_generation/data.py:159) or a directory of frame images
    (reference text2video_retrieval/data.py:233). Returns (frames, n_real):
    a list of PIL images padded to max_frames with black, and the real count.
    """
    import json
    import os
    from PIL import Image
    decode_fn = decode_fn or decode_base64_image_urlsafe
    value = str(value)
    frames = []
    if os.path.isdir(value):
        for name in sorted(os.listdir(value)):
            frames.append(Image.open(os.path.join(value, name)).convert("RGB"))
    else:
        try:
            items = json.loads(value)
        except ValueError:
            items = value.split(",")
        for item in items:
            frames.append(decode_fn(item))
    frames = frames[:max_frames]
    n_real = len(frames)
    while len(frames) < max_frames:
        frames.append(Image.new("RGB", frames[0].size if frames else (8, 8),
                                (0, 0, 0)))
    return frames, n_real
