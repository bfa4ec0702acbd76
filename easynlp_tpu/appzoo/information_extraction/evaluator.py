"""IE evaluator: span-level P/R/F1 over score>0 spans (reference
easynlp/appzoo/information_extraction/evaluator.py)."""

import numpy as np

from easynlp_tpu.core.evaluator import Evaluator


class InformationExtractionEvaluator(Evaluator):
    def __init__(self, valid_dataset, **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(valid_dataset, **kwargs)

    def evaluate(self, app):
        import jax
        tp = fp = fn = 0
        for batch in self.valid_loader:
            valid = batch.pop("_valid").astype(bool)
            out = jax.device_get(self.forward(app, batch))
            scores = np.asarray(out["span_scores"])[valid]
            labels = batch["span_labels"][valid]
            pred = scores > 0
            gold = labels > 0
            tp += int((pred & gold).sum())
            fp += int((pred & ~gold).sum())
            fn += int((~pred & gold).sum())
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-8)
        return [("f1", f1), ("precision", precision), ("recall", recall)]
