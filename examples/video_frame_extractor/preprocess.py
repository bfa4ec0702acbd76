"""Scan a directory of videos into an `id \t path` TSV, validating that
each file decodes (TPU-native equivalent of the reference
examples/video_frame_extractor/preprocess.py; cv2 instead of decord)."""

import argparse
import os

VALID_VIDEO_EXT = (".mp4", ".avi", ".mkv", ".mov")


def validation(video_path):
    import cv2

    cap = cv2.VideoCapture(video_path)
    ok = cap.isOpened() and cap.read()[0]
    cap.release()
    if not ok:
        print("broken video %s" % video_path)
    return bool(ok)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    n = 0
    with open(args.output, "w") as fout:
        for name in sorted(os.listdir(args.video_dir)):
            if not name.lower().endswith(VALID_VIDEO_EXT):
                continue
            path = os.path.join(args.video_dir, name)
            if not validation(path):
                continue
            fout.write("%s\t%s\n" % (os.path.splitext(name)[0], path))
            n += 1
    print("wrote %d rows to %s" % (n, args.output))


if __name__ == "__main__":
    main()
