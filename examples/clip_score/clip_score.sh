#!/usr/bin/env bash
# CLIP-score example — TPU-native equivalent of the reference
# examples/clip_score/clip_score.sh: evaluate a (text, image-base64) TSV
# with `cosine_similarity=True`, printing the per-pair cosine similarity
# and its average instead of retrieval recall.
#
# Defaults use tiny synthetic fixtures so this runs anywhere; point TABLE
# at a real pair TSV (text \t imgbase64) and MODEL at a trained wukong/clip
# checkpoint (e.g. wukong_vit_l_14_clip from the zoo registry) for real
# scoring.
set -e
cd "$(dirname "$0")"
DATA=${DATA:-./data}
MODEL=${MODEL:-$DATA/pretrain}
TABLE=${TABLE:-$DATA/dev.tsv}
SEQ=${SEQ:-16}; BS=${BS:-8}

[ -f "$TABLE" ] || python ../appzoo_tutorials/gen_data.py wukong_clip "$DATA"

python -m easynlp_tpu.cli \
  --mode=evaluate --app_name=wukong_clip \
  --tables="$TABLE" \
  --input_schema="id:str:1,text:str:1,imgbase64:str:1" \
  --first_sequence=text \
  --second_sequence=imgbase64 \
  --checkpoint_dir="$MODEL" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --random_seed=42 \
  --user_defined_parameters="cosine_similarity=True image_size=16"
