#!/usr/bin/env bash
# LDM finetune + sampling (reference examples/latent_diffusion).
set -euo pipefail
easynlp --mode=train --app_name=latent_diffusion \
  --tables=pairs_train.tsv,pairs_dev.tsv \
  --input_schema=text:str:1,image:str:1 \
  --first_sequence=text --second_sequence=image \
  --pretrained_model_name_or_path=${MODEL:-./pai-diffusion-general} \
  --checkpoint_dir=./ldm_ckpt --learning_rate=1e-5 --epoch_num=1 \
  --micro_batch_size=8 --user_defined_parameters="ema_decay=0.9999"
# prompt -> base64 PNG (DDIM 50 steps, CFG 7.5, optional ESRGAN upscale)
easynlp --mode=predict --app_name=latent_diffusion \
  --tables=prompts.tsv --outputs=images.tsv \
  --input_schema=text:str:1 --first_sequence=text \
  --output_schema=image_base64 --checkpoint_dir=./ldm_ckpt \
  --user_defined_parameters="ddim_steps=50 guidance_scale=7.5"
