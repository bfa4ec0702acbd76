"""MLM evaluator: masked-token accuracy + perplexity (reference
easynlp/appzoo/language_modeling/evaluator.py)."""

import numpy as np

from easynlp_tpu.core.evaluator import Evaluator


class LanguageModelingEvaluator(Evaluator):
    def __init__(self, valid_dataset, **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(valid_dataset, **kwargs)

    def evaluate(self, app):
        import jax
        total_nll, total_correct, total_count = 0.0, 0, 0
        for batch in self.valid_loader:
            valid = batch.pop("_valid").astype(bool)
            out = jax.device_get(self.forward(app, batch))
            logits = np.asarray(out["logits"], np.float32)[valid]
            labels = batch["label_ids"][valid]
            keep = labels != -100
            if not keep.any():
                continue
            lse = _logsumexp(logits, axis=-1)
            gold = np.take_along_axis(
                logits, np.maximum(labels, 0)[..., None], axis=-1)[..., 0]
            nll = (lse - gold)[keep]
            total_nll += float(nll.sum())
            total_correct += int((logits.argmax(-1) == labels)[keep].sum())
            total_count += int(keep.sum())
        ppl = float(np.exp(total_nll / max(total_count, 1)))
        acc = total_correct / max(total_count, 1)
        return [("accuracy", acc), ("perplexity", -ppl)]


def _logsumexp(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True)))[..., 0]
