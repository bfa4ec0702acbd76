#!/usr/bin/env bash
# Quick-start with a user-defined main: the train/evaluate/predict loop is
# assembled from the library API in main*.py instead of the --app_name
# dispatcher. Reference parity:
# /root/reference/examples/quick_start_user_defined/run_user_defined_local.sh
set -e
cd "$(dirname "$0")"
DATA=${DATA:-./data}
MODEL=${MODEL:-$DATA/pretrain}
CKPT=${CKPT:-./ckpt}
TRAIN_TABLE=${TRAIN_TABLE:-$DATA/train.tsv}
DEV_TABLE=${DEV_TABLE:-$DATA/dev.tsv}
SEQ=${SEQ:-16}; BS=${BS:-8}; EPOCHS=${EPOCHS:-1}; LR=${LR:-3e-4}

[ -f "$TRAIN_TABLE" ] || python ../appzoo_tutorials/gen_data.py text_classify "$DATA"

SCHEMA="id:str:1,sent:str:1,label:str:1"

python main.py \
  --mode=train \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="$SCHEMA" \
  --first_sequence=sent --label_name=label \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL"

python main_evaluate.py \
  --mode=evaluate \
  --tables="$DEV_TABLE" \
  --input_schema="$SCHEMA" \
  --first_sequence=sent --label_name=label \
  --checkpoint_dir="$CKPT" \
  --micro_batch_size="$BS" --sequence_length="$SEQ"

python main_predict.py \
  --mode=predict \
  --tables="$DEV_TABLE" --outputs="$CKPT/pred.tsv" \
  --input_schema="$SCHEMA" \
  --first_sequence=sent \
  --output_schema=predictions,probabilities --append_cols=id \
  --checkpoint_dir="$CKPT" \
  --micro_batch_size="$BS" --sequence_length="$SEQ"

head -2 "$CKPT/pred.tsv"
