#!/usr/bin/env bash
# machine_reading_comprehension tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/machine_reading_comprehension runner.
# Defaults use tiny synthetic fixtures (gen_data.py) so this runs anywhere;
# point MODEL at a zoo name / real dir and *_TABLE at real data for real work.
set -e
cd "$(dirname "$0")"
DATA=${DATA:-./data}
MODEL=${MODEL:-$DATA/pretrain}
CKPT=${CKPT:-./ckpt}
TRAIN_TABLE=${TRAIN_TABLE:-$DATA/train.tsv}
DEV_TABLE=${DEV_TABLE:-$DATA/dev.tsv}
SEQ=${SEQ:-32}; BS=${BS:-8}; EPOCHS=${EPOCHS:-1}; LR=${LR:-3e-4}
EXTRA=${EXTRA:-}

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py machine_reading_comprehension "$DATA"

python -m easynlp_tpu.cli \
  --mode=train --app_name=machine_reading_comprehension \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="qas_id:str:1,question:str:1,context:str:1,answer:str:1" \
  --first_sequence=question \
  --second_sequence=context \
  --label_name=answer \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL" \
  $EXTRA

python -m easynlp_tpu.cli \
  --mode=predict --app_name=machine_reading_comprehension \
  --tables="$DEV_TABLE" --outputs="$CKPT/pred.tsv" \
  --input_schema="qas_id:str:1,question:str:1,context:str:1,answer:str:1" \
  --first_sequence=question \
  --second_sequence=context \
  --output_schema=predictions --append_cols=qas_id \
  --checkpoint_dir="$CKPT" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  $EXTRA

head -2 "$CKPT/pred.tsv"
