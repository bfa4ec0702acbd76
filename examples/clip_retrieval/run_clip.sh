#!/usr/bin/env bash
# Chinese-CLIP contrastive training + retrieval predict (reference
# examples/clip_pai). TSV rows: text \t base64(image); webdataset .tar
# shards also accepted (--tables=shard-{0000..0127}.tar).
set -euo pipefail
easynlp --mode=train --app_name=clip \
  --tables=pairs_train.tsv,pairs_dev.tsv \
  --input_schema=text:str:1,image:str:1 \
  --first_sequence=text --second_sequence=image \
  --pretrained_model_name_or_path=${MODEL:-./chinese-clip-vit-b32} \
  --checkpoint_dir=./clip_ckpt --learning_rate=1e-5 \
  --epoch_num=3 --micro_batch_size=128 --sequence_length=32 \
  --user_defined_parameters="fix_vision=false"
easynlp --mode=predict --app_name=clip \
  --tables=queries.tsv --outputs=text_feat.tsv \
  --input_schema=text:str:1 --first_sequence=text \
  --output_schema=text_feat --checkpoint_dir=./clip_ckpt
