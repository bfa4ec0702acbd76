"""Distillation trainers.

Capability parity: reference easynlp/core/distiller.py — DistillatoryTrainer
(:23-80, teacher_logits routed into the loss), MetaTeacherTrainer (:83-133,
domain-weighted teacher finetuning) and MetaDistillationTrainer (:136-268,
two-stage teacher→student alignment).

In this build the vanilla-KD path needs no Trainer subclass (the KD loss is
the app's loss_fn and the dataset joins teacher logits), but the subclasses
are provided for API parity and for the meta variants, which need
teacher-model state alongside the student.
"""

import jax
import jax.numpy as jnp

from easynlp_tpu.core.trainer import Trainer
from easynlp_tpu.utils import losses
from easynlp_tpu.utils.logger import logger


class DistillatoryTrainer(Trainer):
    """Vanilla KD (reference :23-80). The teacher_logits batch column flows
    straight into DistillatorySequenceClassification.loss_fn; this subclass
    exists for reference-API parity and sanity-checks the dataset."""

    def __init__(self, model, train_dataset, evaluator=None, **kwargs):
        if "teacher_logits" not in getattr(train_dataset, "features", {}):
            logger.warning(
                "DistillatoryTrainer: train dataset has no teacher_logits "
                "column — set logits_saved_path in user_defined_parameters")
        super().__init__(model, train_dataset, evaluator=evaluator, **kwargs)


class MetaTeacherTrainer(Trainer):
    """Meta teacher finetuning (reference :83-133): the teacher trains with a
    per-sample domain-corrected weighting — samples whose domain classifier
    confidence is low get up-weighted so the teacher stays domain-general.

    Expects batches with 'domain_ids' and an app whose outputs include
    'logits' and optionally 'domain_logits'."""

    def _build_step(self):
        app = self.app
        base_loss = app.loss_fn

        def weighted_loss(outputs, batch):
            out = base_loss(outputs, batch)
            if "domain_logits" in outputs and "domain_ids" in batch:
                dom_ce = losses.cross_entropy(outputs["domain_logits"],
                                              batch["domain_ids"])
                probs = jax.nn.softmax(
                    outputs["domain_logits"].astype(jnp.float32), -1)
                conf = jnp.take_along_axis(
                    probs, batch["domain_ids"][:, None], -1)[:, 0]
                # up-weight low-confidence (domain-ambiguous) samples
                weight = jax.lax.stop_gradient(1.0 - conf) + 0.5
                per_sample = losses.cross_entropy(
                    outputs["logits"], batch["label_ids"])
                out = {"loss": per_sample * jnp.mean(weight) + 0.1 * dom_ce,
                       "domain_loss": dom_ce}
            return out

        app.loss_fn = staticmethod(weighted_loss).__func__
        super()._build_step()


class MetaDistillationTrainer(Trainer):
    """Meta distillation (reference :136-268): stage 1 aligns student hidden
    representations to the teacher's (MSE over [CLS]); stage 2 does logit KD.
    The teacher app is frozen; its forward runs inside the same jitted step."""

    def __init__(self, model, train_dataset, teacher_app=None, evaluator=None,
                 stage=2, temperature=2.0, alpha=0.5, **kwargs):
        self.teacher_app = teacher_app
        self.stage = stage
        self.temperature = temperature
        self.alpha = alpha
        super().__init__(model, train_dataset, evaluator=evaluator, **kwargs)

    def _build_step(self):
        if self.teacher_app is None:
            super()._build_step()
            return
        teacher_module = self.teacher_app.module
        teacher_params = self.teacher_app.params  # frozen, closed over
        student = self.app
        stage, t, a = self.stage, self.temperature, self.alpha

        def kd_loss(outputs, batch):
            t_out = teacher_module.apply(
                {"params": teacher_params},
                input_ids=batch["input_ids"],
                attention_mask=batch.get("attention_mask"),
                token_type_ids=batch.get("token_type_ids"),
                deterministic=True)
            t_logits = jax.lax.stop_gradient(t_out["logits"])
            if stage == 1 and "pooler_output" in t_out \
                    and "pooler_output" in outputs:
                rep = jnp.mean((outputs["pooler_output"]
                                - jax.lax.stop_gradient(
                                    t_out["pooler_output"])) ** 2)
                return {"loss": rep, "rep_loss": rep}
            loss = losses.vanilla_kd_loss(outputs["logits"], t_logits,
                                          batch["label_ids"],
                                          temperature=t, alpha=a)
            return {"loss": loss}

        student.loss_fn = staticmethod(kd_loss).__func__
        super()._build_step()
