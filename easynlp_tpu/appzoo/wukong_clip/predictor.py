"""Wukong CLIP predictor (reference easynlp/appzoo/wukong_clip/predictor.py
— text and/or image → embeddings)."""

from easynlp_tpu.appzoo.clip.predictor import CLIPPredictor


class WukongCLIPPredictor(CLIPPredictor):
    pass
