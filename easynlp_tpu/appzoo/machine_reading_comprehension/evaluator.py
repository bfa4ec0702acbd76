"""MRC evaluator: exact-span accuracy + token-level F1 (reference
easynlp/appzoo/machine_reading_comprehension/evaluator.py)."""

import numpy as np

from easynlp_tpu.core.evaluator import Evaluator


class MRCEvaluator(Evaluator):
    def __init__(self, valid_dataset, **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(valid_dataset, **kwargs)

    def evaluate(self, app):
        import jax
        exact = f1_sum = n = 0
        for batch in self.valid_loader:
            valid = batch.pop("_valid").astype(bool)
            out = jax.device_get(self.forward(app, batch))
            sp = np.asarray(out["start_predictions"])[valid]
            ep = np.asarray(out["end_predictions"])[valid]
            sg = batch["start_positions"][valid]
            eg = batch["end_positions"][valid]
            for i in range(len(sg)):
                pred = set(range(int(sp[i]), int(ep[i]) + 1)) \
                    if ep[i] >= sp[i] else set()
                gold = set(range(int(sg[i]), int(eg[i]) + 1))
                exact += int(sp[i] == sg[i] and ep[i] == eg[i])
                inter = len(pred & gold)
                if inter:
                    prec = inter / len(pred)
                    rec = inter / len(gold)
                    f1_sum += 2 * prec * rec / (prec + rec)
                n += 1
        return [("f1", f1_sum / max(n, 1)), ("exact_match", exact / max(n, 1))]
