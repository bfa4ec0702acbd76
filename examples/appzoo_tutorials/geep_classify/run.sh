#!/usr/bin/env bash
# geep_classify tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/geep (GEEP fast exit) runner.
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

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py geep_classify "$DATA"

python -m easynlp_tpu.cli \
  --mode=train --app_name=geep_classify \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="id:str:1,sent:str:1,label:str:1" \
  --first_sequence=sent \
  --label_name=label \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL" \
  $EXTRA

python -m easynlp_tpu.cli \
  --mode=predict --app_name=geep_classify \
  --tables="$DEV_TABLE" --outputs="$CKPT/pred.tsv" \
  --input_schema="id:str:1,sent:str:1,label:str:1" \
  --first_sequence=sent \
  --output_schema=predictions,probabilities --append_cols=id \
  --checkpoint_dir="$CKPT" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  $EXTRA

head -2 "$CKPT/pred.tsv"
