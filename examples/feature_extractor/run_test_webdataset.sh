#!/usr/bin/env bash
# Extract CLIP image features from a webdataset tar shard (reference
# examples/feature_extractor/run_test_webdataset.sh).
set -e
cd "$(dirname "$0")"
DATA=${DATA:-./data}
MODEL=${MODEL:-$DATA/pretrain}
SHARD=${SHARD:-$DATA/shard-000.tar}
OUT=${OUT:-$DATA/features.tsv}
SEQ=${SEQ:-16}; BS=${BS:-8}; IMG=${IMG:-16}

[ -f "$SHARD" ] || python gen_shard.py "$DATA"

python main_featext.py \
  --mode=predict \
  --tables="$SHARD" --outputs="$OUT" \
  --checkpoint_dir="$MODEL" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --user_defined_parameters="image_size=$IMG"

head -c 300 "$OUT"; echo
