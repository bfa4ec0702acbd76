#!/usr/bin/env bash
# latent_diffusion tutorial — TPU-native equivalent of the reference
# examples/appzoo_tutorials/latent_diffusion (PAI-Diffusion) runner.
# Defaults use tiny synthetic fixtures (gen_data.py) so this runs anywhere;
# point MODEL at a zoo name / real dir and *_TABLE at real data for real work.
# Variants via EXTRA:
#   adapter finetune:     EXTRA='enable_lora=True lora_rank=4' (in the UDP)
#   ControlNet finetune:  append 'enable_controlnet=True' to
#                         --user_defined_parameters (trains the conditioning
#                         clone, base frozen; hint = in-graph edge map)
set -e
cd "$(dirname "$0")"
DATA=${DATA:-./data}
MODEL=${MODEL:-$DATA/pretrain}
CKPT=${CKPT:-./ckpt}
TRAIN_TABLE=${TRAIN_TABLE:-$DATA/train.tsv}
DEV_TABLE=${DEV_TABLE:-$DATA/dev.tsv}
SEQ=${SEQ:-16}; BS=${BS:-8}; EPOCHS=${EPOCHS:-1}; LR=${LR:-3e-4}
EXTRA=${EXTRA:-}

[ -f "$TRAIN_TABLE" ] || python ../gen_data.py latent_diffusion "$DATA"

python -m easynlp_tpu.cli \
  --mode=train --app_name=latent_diffusion \
  --tables="$TRAIN_TABLE,$DEV_TABLE" \
  --input_schema="id:str:1,text:str:1,imgbase64:str:1" \
  --first_sequence=text \
  --second_sequence=imgbase64 \
  --checkpoint_dir="$CKPT" --epoch_num="$EPOCHS" \
  --micro_batch_size="$BS" --sequence_length="$SEQ" \
  --learning_rate="$LR" \
  --user_defined_parameters="pretrain_model_name_or_path=$MODEL image_size=16" \
  $EXTRA
