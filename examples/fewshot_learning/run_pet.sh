#!/usr/bin/env bash
# PET few-shot classification (reference examples/fewshot_learning).
set -euo pipefail
easynlp --mode=train --app_name=text_classify \
  --tables=train_few.tsv,dev.tsv \
  --input_schema=label:str:1,sent1:str:1 --first_sequence=sent1 \
  --label_name=label --label_enumerate_values=0,1 \
  --pretrained_model_name_or_path=./bert-base-chinese \
  --checkpoint_dir=./pet_ckpt \
  --user_defined_parameters="enable_fewshot=true type=pet_fewshot \
      pattern='it was [MASK]. sent1' \
      label_desc='terrible,great'"
# CPT variant: type=cpt_fewshot (contrastive prompt tuning)
