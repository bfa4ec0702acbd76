#!/usr/bin/env bash
# video2text_generation tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/video2text_generation runner.
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

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py video2text_generation "$DATA"

python -m easynlp_tpu.cli \
  --mode=train --app_name=video2text_generation \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="id:str:1,frames:str:1,text:str:1" \
  --first_sequence=frames \
  --second_sequence=text \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL img_size=16 text_len=8 frame_num=2" \
  $EXTRA

python -m easynlp_tpu.cli \
  --mode=predict --app_name=video2text_generation \
  --tables="$DEV_TABLE" --outputs="$CKPT/pred.tsv" \
  --input_schema="id:str:1,frames:str:1,text:str:1" \
  --first_sequence=frames \
  --second_sequence=text \
  --output_schema=gen_text --append_cols=id \
  --checkpoint_dir="$CKPT" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --user_defined_parameters="img_size=16 text_len=8 frame_num=2" \
  $EXTRA

head -2 "$CKPT/pred.tsv"
