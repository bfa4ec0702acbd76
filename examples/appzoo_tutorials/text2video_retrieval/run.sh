#!/usr/bin/env bash
# text2video_retrieval tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/text2video_retrieval runner.
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

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py text2video_retrieval "$DATA"

python -m easynlp_tpu.cli \
  --mode=train --app_name=text2video_retrieval \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="id:str:1,text:str:1,video:str:1" \
  --first_sequence=text \
  --second_sequence=video \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL max_frames=3 img_size=16" \
  $EXTRA

python -m easynlp_tpu.cli \
  --mode=predict --app_name=text2video_retrieval \
  --tables="$DEV_TABLE" --outputs="$CKPT/pred.tsv" \
  --input_schema="id:str:1,text:str:1,video:str:1" \
  --first_sequence=text \
  --second_sequence=video \
  --output_schema=text_embeds,video_embeds --append_cols=id \
  --checkpoint_dir="$CKPT" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --user_defined_parameters="max_frames=3 img_size=16" \
  $EXTRA

head -2 "$CKPT/pred.tsv"
