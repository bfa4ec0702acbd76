"""Text match evaluator (reference easynlp/appzoo/text_match/evaluator.py:
accuracy/AUC/F1 for cross-encoder; similarity-threshold metrics for
two-tower)."""

from easynlp_tpu.appzoo.sequence_classification.evaluator import (
    SequenceClassificationEvaluator,
)


class TextMatchEvaluator(SequenceClassificationEvaluator):
    pass


class TextMatchTwoTowerEvaluator(SequenceClassificationEvaluator):
    """Two-tower evaluation: similarity > 0.5 as the positive class; logits
    are the stacked [-sim, sim] pair from the module."""
