#!/usr/bin/env bash
# Text classification quickstart (reference examples/appzoo_tutorials/
# sequence_classification). Expects train.tsv/dev.tsv with "label \t text".
set -euo pipefail
MODEL=${MODEL:-./bert-base-chinese}
easynlp --mode=train --app_name=text_classify \
  --tables=train.tsv,dev.tsv \
  --input_schema=label:str:1,sent1:str:1 \
  --first_sequence=sent1 --label_name=label \
  --label_enumerate_values=0,1 \
  --pretrained_model_name_or_path="$MODEL" \
  --checkpoint_dir=./clf_ckpt \
  --learning_rate=3e-5 --epoch_num=3 --micro_batch_size=32 \
  --sequence_length=128 --scan_unroll=12 --remat=names

easynlp --mode=evaluate --app_name=text_classify \
  --tables=dev.tsv --input_schema=label:str:1,sent1:str:1 \
  --first_sequence=sent1 --label_name=label \
  --checkpoint_dir=./clf_ckpt

easynlp --mode=predict --app_name=text_classify \
  --tables=test.tsv --outputs=pred.tsv \
  --input_schema=sent1:str:1 --first_sequence=sent1 \
  --output_schema=predictions,probabilities \
  --checkpoint_dir=./clf_ckpt
