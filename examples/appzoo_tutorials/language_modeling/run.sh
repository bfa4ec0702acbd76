#!/usr/bin/env bash
# language_modeling tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/language_modeling runner.
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

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py language_modeling "$DATA"

python -m easynlp_tpu.cli \
  --mode=train --app_name=language_modeling \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="id:str:1,sent:str:1" \
  --first_sequence=sent \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL" \
  $EXTRA
