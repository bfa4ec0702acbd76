"""Text↔video retrieval evaluator (reference easynlp/appzoo/
text2video_retrieval/evaluator.py:29-75 — t2v/v2t recall@{1,5,10} +
mean_recall over the validation set)."""

from easynlp_tpu.appzoo.clip.evaluator import CLIPEvaluator


class Text2VideoRetrievalEvaluator(CLIPEvaluator):
    """CLIP4ClipModule aliases video_embeds to image_embeds, so the in-batch
    recall computation is shared with the CLIP evaluator."""
