"""Distillation trainers.

Capability parity: reference easynlp/core/distiller.py — DistillatoryTrainer
(:23-80, teacher_logits routed into the loss), MetaTeacherTrainer (:83-133,
per-instance domain-weighted teacher finetuning) and MetaDistillationTrainer
(:136-268, two-stage teacher→student transfer).

TPU shape: the teacher is frozen params closed over by the student's jitted
train step — teacher forward, transfer losses, and the student update compile
into ONE program (the reference runs two graphs and syncs per batch)."""

import jax
import jax.numpy as jnp

from easynlp_tpu.core.trainer import Trainer
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
    """Meta-teacher finetuning (reference :83-133): per-instance CE + domain
    CE, each sample weighted by its precomputed sample_weight. Batches carry
    'domain_ids' and 'sample_weights' (MetaKDClassificationDataset)."""

    def __init__(self, model, train_dataset, evaluator=None,
                 user_defined_parameters=None, **kwargs):
        udp = user_defined_parameters or {}
        use_domain_loss = str(udp.get("use_domain_loss", "True")) == "True"
        use_sample_weights = str(udp.get("use_sample_weights",
                                         "True")) == "True"
        dlw = float(udp.get("domain_loss_weight", 0.5))
        from easynlp_tpu.distillation.distill_metakd_application import (
            meta_teacher_loss)

        def weighted_loss(outputs, batch):
            return meta_teacher_loss(
                outputs, batch, use_domain_loss=use_domain_loss,
                use_sample_weights=use_sample_weights,
                domain_loss_weight=dlw)

        model.loss_fn = staticmethod(weighted_loss).__func__
        super().__init__(model, train_dataset, evaluator=evaluator, **kwargs)


class MetaDistillationTrainer(Trainer):
    """Meta distillation (reference :136-268): stage 'first' transfers
    attention score maps, fit-projected hidden states, and the domain-corrupt
    representation with teacher-confidence weights; stage 'second' distills
    temperature-scaled logits. The frozen teacher runs inside the same jitted
    step."""

    def __init__(self, model, train_dataset, teacher_app=None, evaluator=None,
                 user_defined_parameters=None, stage=None, temperature=None,
                 **kwargs):
        if teacher_app is None:
            raise ValueError("MetaDistillationTrainer needs teacher_app")
        udp = user_defined_parameters or {}
        stage = stage or udp.get("distill_stage", "second")
        if stage in (1, "1"):
            stage = "first"
        if stage in (2, "2"):
            stage = "second"
        if stage not in ("first", "second"):
            raise ValueError("distill_stage must be 'first' or 'second'")
        temperature = float(temperature or udp.get("T", 2.0))
        dlw = float(udp.get("domain_loss_weight", 0.5))

        teacher_module = teacher_app.module
        teacher_params = jax.tree.map(jax.lax.stop_gradient,
                                      teacher_app.params)
        from easynlp_tpu.distillation.distill_metakd_application import (
            meta_student_stage1_loss, meta_student_stage2_loss)

        def kd_loss(outputs, batch):
            t_out = teacher_module.apply(
                {"params": teacher_params},
                input_ids=batch["input_ids"],
                attention_mask=batch.get("attention_mask"),
                token_type_ids=batch.get("token_type_ids"),
                domain_ids=batch.get("domain_ids"),
                deterministic=True)
            t_out = jax.tree.map(jax.lax.stop_gradient, t_out)
            if stage == "first":
                return meta_student_stage1_loss(
                    outputs, t_out, batch, domain_loss_weight=dlw)
            return meta_student_stage2_loss(outputs, t_out,
                                            temperature=temperature)

        model.loss_fn = staticmethod(kd_loss).__func__
        super().__init__(model, train_dataset, evaluator=evaluator, **kwargs)
