"""Wukong CLIP evaluator (reference easynlp/appzoo/wukong_clip/evaluator.py
— in-batch t2i/i2t recall, same computation as the CLIP evaluator)."""

from easynlp_tpu.appzoo.clip.evaluator import CLIPEvaluator


class WukongCLIPEvaluator(CLIPEvaluator):
    pass
