"""Text→image evaluator (reference easynlp/appzoo/text2image_generation/
evaluator.py:30-76 — validation loss; score is -loss so 'higher is better'
matches the trainer's best-checkpoint logic)."""

from easynlp_tpu.core.evaluator import Evaluator
from easynlp_tpu.utils.logger import logger


class LossEvaluator(Evaluator):
    """Shared loss-only evaluator for the generation-style vision apps: the
    reference's text2image / image2text / video2text evaluators are all the
    same eval-loss loop (each ~77 LoC of the same code)."""

    def __init__(self, valid_dataset, app_loss_fn=None, **kwargs):
        for k in ("multi_label",):
            kwargs.pop(k, None)
        super().__init__(valid_dataset, **kwargs)
        self.metrics = ["loss"]

    def evaluate(self, app):
        total_loss, total_weight = 0.0, 0
        for batch in self.valid_loader:
            valid = batch.pop("_valid").astype(bool)
            out = self.forward(app, batch)
            loss = float(app.loss_fn(out, batch)["loss"])
            total_loss += loss * int(valid.sum())
            total_weight += int(valid.sum())
        eval_loss = total_loss / max(total_weight, 1)
        logger.info("Eval loss: %.6f", eval_loss)
        return [("eval_loss", -eval_loss)]


class TextImageGenerationEvaluator(LossEvaluator):
    pass
