"""Video → frame-TSV extractor (TPU-native equivalent of the reference
examples/video_frame_extractor/main.py, which uses decord; this build uses
OpenCV, which is in the image).

Reads an input TSV of `id \t video_path` rows (produced by preprocess.py),
samples frames — one per second by default, or exactly --frame_num evenly
spaced frames — JPEG-encodes each frame to base64, and writes
`id \t base64,base64,...` rows ready for the text2video_retrieval /
video2text_generation apps' input schema.
"""

import argparse
import base64
import os
from io import BytesIO

import numpy as np
from PIL import Image


def image_to_base64(img_numpy):
    img = Image.fromarray(np.uint8(img_numpy)).convert("RGB")
    buf = BytesIO()
    img.save(buf, format="jpeg")
    return str(base64.b64encode(buf.getvalue()), "utf-8")


def extract_video_frames(video_path, frame_num=-1):
    """Sample frames as RGB numpy arrays.

    frame_num == -1: one frame per second (reference main.py behaviour);
    otherwise exactly frame_num evenly spaced frames.
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError("cannot open video %s" % video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 1.0
    if frame_num == -1:
        idx = list(range(0, total, max(int(fps), 1)))
    else:
        step = max(int(total / frame_num), 1)
        idx = list(range(0, total, step))[:frame_num]
    frames, want, pos = [], set(idx), 0
    # sequential decode (cv2 seeks are unreliable on some codecs)
    while pos <= max(idx):
        ok, frame = cap.read()
        if not ok:
            break
        if pos in want:
            frames.append(frame[:, :, ::-1])  # BGR → RGB
        pos += 1
    cap.release()
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="TSV of id\\tvideo_path rows (see preprocess.py)")
    p.add_argument("--output", required=True,
                   help="output TSV of id\\tb64,b64,... rows")
    p.add_argument("--frame_num", type=int, default=-1,
                   help="-1: one frame/second; N: exactly N evenly spaced")
    args = p.parse_args()

    n = 0
    with open(args.input) as fin, open(args.output, "w") as fout:
        for line in fin:
            line = line.rstrip("\n")
            if not line:
                continue
            vid, path = line.split("\t")[:2]
            frames = extract_video_frames(path, args.frame_num)
            if not frames:
                print("no frames decoded from %s; skipping" % path)
                continue
            fout.write("%s\t%s\n"
                       % (vid, ",".join(image_to_base64(f) for f in frames)))
            n += 1
    print("wrote %d rows to %s" % (n, args.output))


if __name__ == "__main__":
    main()
