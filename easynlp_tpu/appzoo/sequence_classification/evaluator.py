"""Classification evaluator (capability parity: reference
easynlp/appzoo/sequence_classification/evaluator.py:30-139 — accuracy / macro
F1 / AUC / MCC via sklearn, primary metric first)."""

import time

import numpy as np

from easynlp_tpu.core.evaluator import Evaluator
from easynlp_tpu.utils.logger import logger


class SequenceClassificationEvaluator(Evaluator):
    def __init__(self, valid_dataset, multi_label=False, eval_metrics=None,
                 **kwargs):
        super().__init__(valid_dataset, **kwargs)
        self.multi_label = multi_label
        args = kwargs.get("args") or self.args
        raw = eval_metrics or getattr(args, "user_defined_parameters_dict",
                                      {}).get("eval_metrics")
        self.eval_metrics = raw.split(",") if isinstance(raw, str) else raw

    def evaluate(self, app):
        import jax
        logits_all, labels_all = [], []
        t0 = time.time()
        n = 0
        for batch in self.valid_loader:
            valid = batch.pop("_valid")
            out = jax.device_get(self.forward(app, batch))
            keep = valid.astype(bool)
            # bf16 ml_dtypes arrays break sklearn — force fp32
            logits_all.append(np.asarray(out["logits"]).astype(np.float32)[keep])
            labels_all.append(batch["label_ids"][keep])
            n += int(keep.sum())
        elapsed = time.time() - t0
        logits = np.concatenate(logits_all)
        labels = np.concatenate(labels_all)
        logger.info("eval: %d samples in %.2fs (%.2f ms/sample)",
                    n, elapsed, 1000.0 * elapsed / max(n, 1))
        if self.multi_label:
            return self._multi_label_metrics(logits, labels)
        return self._single_label_metrics(logits, labels)

    def _single_label_metrics(self, logits, labels):
        """Default accuracy/F1/AUC/MCC set, plus the reference's opt-in
        metrics via udp eval_metrics: pearson_and_spearman (regression
        heads, reference evaluator.py:123-131), classification_report
        (:132-134), precision/recall."""
        from sklearn.metrics import (accuracy_score, f1_score,
                                     matthews_corrcoef, precision_score,
                                     recall_score, roc_auc_score)
        preds = logits.argmax(-1)
        n_classes = logits.shape[-1]
        requested = self.eval_metrics or []
        if "pearson_and_spearman" in requested or n_classes == 1:
            from scipy.stats import pearsonr, spearmanr
            scores = logits[:, 0] if logits.ndim > 1 else logits
            pearson = float(pearsonr(scores, labels)[0])
            spearman = float(spearmanr(scores, labels)[0])
            return [("pearson_and_spearman", (pearson + spearman) / 2.0),
                    ("pearson", pearson), ("spearman", spearman)]
        results = [("accuracy", accuracy_score(labels, preds))]
        average = "binary" if n_classes == 2 else "macro"
        try:
            results.append(("f1", f1_score(labels, preds, average=average)))
        except ValueError:
            pass
        if n_classes == 2 and len(set(labels.tolist())) == 2:
            probs = _softmax(logits)[:, 1]
            results.append(("auc", roc_auc_score(labels, probs)))
            results.append(("mcc", matthews_corrcoef(labels, preds)))
        if "precision_recall" in requested or "classification_report" in \
                requested:
            results.append(("precision", precision_score(
                labels, preds, average=average, zero_division=0)))
            results.append(("recall", recall_score(
                labels, preds, average=average, zero_division=0)))
        if "classification_report" in requested:
            from sklearn.metrics import classification_report
            logger.info("\n%s", classification_report(labels, preds,
                                                      digits=4))
        return results

    def _multi_label_metrics(self, logits, labels):
        from sklearn.metrics import (f1_score, precision_score,
                                     recall_score)
        preds = (logits > 0).astype(np.int32)
        return [("f1_micro", f1_score(labels, preds, average="micro",
                                      zero_division=0)),
                ("f1_macro", f1_score(labels, preds, average="macro",
                                      zero_division=0)),
                ("precision_micro", precision_score(
                    labels, preds, average="micro", zero_division=0)),
                ("recall_micro", recall_score(
                    labels, preds, average="micro", zero_division=0))]


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)
