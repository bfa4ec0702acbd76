#!/usr/bin/env bash
# GLM blank-infilling finetune over a TP mesh (reference
# appzoo/sequence_generation/mg_seq2seq + mg_utils/finetune_glm.py;
# here it is the same Trainer with --mesh tp>1 and the GLM recipe).
set -euo pipefail
easynlp --mode=train --app_name=sequence_generation \
  --tables=src_tgt_train.tsv,src_tgt_dev.tsv \
  --input_schema=src:str:1,tgt:str:1 \
  --first_sequence=src --second_sequence=tgt \
  --pretrained_model_name_or_path=${MODEL:-./glm-large-chinese} \
  --checkpoint_dir=./glm_ckpt --mesh "dp=2,tp=4" \
  --micro_batch_size=8 --sequence_length=512 --remat=names \
  --user_defined_parameters="backbone=glm"
