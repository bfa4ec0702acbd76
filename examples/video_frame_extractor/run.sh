#!/usr/bin/env bash
# Extract per-second (or fixed-N) frames from every video in VIDEO_DIR into
# the base64 frame-TSV format consumed by the text2video_retrieval and
# video2text_generation apps. Reference parity:
# /root/reference/examples/video_frame_extractor/run_user_defined_local.sh
set -e
cd "$(dirname "$0")"
VIDEO_DIR=${VIDEO_DIR:-./videos}
OUT=${OUT:-./frames.tsv}
PATHS=${PATHS:-$(dirname "$OUT")/video_paths.tsv}
FRAME_NUM=${FRAME_NUM:--1}

python preprocess.py --video_dir "$VIDEO_DIR" --output "$PATHS"
python main.py --input "$PATHS" --output "$OUT" --frame_num "$FRAME_NUM"
head -c 200 "$OUT"; echo
