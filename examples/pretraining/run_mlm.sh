#!/usr/bin/env bash
# MLM / knowledge-enhanced pretraining (reference examples/*_pretraining).
set -euo pipefail
# plain MLM with whole-word masking (streaming corpus reader)
easynlp --mode=train --app_name=language_modeling \
  --tables=corpus_train.txt,corpus_dev.txt \
  --input_schema=text:str:1 --first_sequence=text \
  --pretrained_model_name_or_path=./bert-base-chinese \
  --checkpoint_dir=./mlm_ckpt --micro_batch_size=64 \
  --sequence_length=512 --remat=names --scan_unroll=12
# DKPLM:   --user_defined_parameters="enable_dkplm=true entity_emb_file=... rel_emb_file=..."
# Kangaroo:--user_defined_parameters="enable_kangaroo=true entity_file=... rel_file=... samples_file=... concept_emb_file=..."
# CKBERT:  --user_defined_parameters="contrast_learning_flag=true external_mask=true"
