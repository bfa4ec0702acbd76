"""Video→text evaluator (reference easynlp/appzoo/video2text_generation/
evaluator.py:30-77 — validation loss)."""

from easynlp_tpu.appzoo.text2image_generation.evaluator import LossEvaluator


class FrameTextGenerationEvaluator(LossEvaluator):
    pass
