"""Video→text predictor (reference easynlp/appzoo/video2text_generation/
predictor.py — base64 frame list → caption)."""

from easynlp_tpu.appzoo.image2text_generation.predictor import (
    ImageTextGenerationPredictor,
)


class FrameTextGenerationPredictor(ImageTextGenerationPredictor):
    frame_input = True
