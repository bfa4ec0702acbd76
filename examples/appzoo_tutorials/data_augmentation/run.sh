#!/usr/bin/env bash
# data_augmentation tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/data_augmentation runner.
# Defaults use tiny synthetic fixtures (gen_data.py) so this runs anywhere;
# point MODEL at a zoo name / real dir and *_TABLE at real data for real work.
set -e
cd "$(dirname "$0")"
DATA=${DATA:-./data}
MODEL=${MODEL:-$DATA/pretrain}
CKPT=${CKPT:-./ckpt}
TRAIN_TABLE=${TRAIN_TABLE:-$DATA/train.tsv}
DEV_TABLE=${DEV_TABLE:-$DATA/dev.tsv}
SEQ=${SEQ:-16}; BS=${BS:-8}; EPOCHS=${EPOCHS:-1}; LR=${LR:-3e-4}
EXTRA=${EXTRA:-}

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py data_augmentation "$DATA"

mkdir -p "$CKPT"

python -m easynlp_tpu.cli \
  --mode=predict --app_name=data_augmentation \
  --tables="$DEV_TABLE" --outputs="$CKPT/pred.tsv" \
  --input_schema="id:str:1,sent:str:1,label:str:1" \
  --first_sequence=sent \
  --output_schema=augmented --append_cols=id \
  --checkpoint_dir="$MODEL" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  $EXTRA

head -2 "$CKPT/pred.tsv"
