#!/usr/bin/env bash
# Vanilla KD then MetaKD (reference examples/knowledge_distillation).
set -euo pipefail
# 1) teacher saves logits
easynlp --mode=predict --app_name=text_classify \
  --tables=train.tsv --outputs=teacher_logits.tsv \
  --input_schema=label:str:1,sent1:str:1 --first_sequence=sent1 \
  --output_schema=logits --checkpoint_dir=./teacher_ckpt
# 2) student distills (type=vanilla_kd, alpha/T from udp)
easynlp --mode=train --app_name=text_classify \
  --tables=train.tsv,dev.tsv \
  --input_schema=label:str:1,sent1:str:1 --first_sequence=sent1 \
  --label_name=label --label_enumerate_values=0,1 \
  --pretrained_model_name_or_path=./bert-small \
  --checkpoint_dir=./student_ckpt \
  --user_defined_parameters="enable_distillation=true type=vanilla_kd \
      logits_saved_path=teacher_logits.tsv logits_name=logits \
      temperature=5 alpha=0.2"
# MetaKD (meta-teacher then meta-student): app_name=text_classify with
# enable_distillation=true type=meta_teacher / type=meta_student — see
# tests/test_metakd.py for the full two-stage recipe.
