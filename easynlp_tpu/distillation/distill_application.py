"""Knowledge distillation applications.

Capability parity: reference easynlp/distillation/distill_application.py
:20-45 — DistillatoryBaseApplication.compute_loss dispatches type=vanilla_kd
to losses.vanilla_loss (KL(student/T ‖ teacher/T)·T² blended α with CE).
The teacher_logits column arrives in the batch via
DistillatoryClassificationDataset.
"""

import jax.numpy as jnp

from easynlp_tpu.appzoo.sequence_classification.model import (
    SequenceClassification,
)
from easynlp_tpu.utils import losses


class DistillatorySequenceClassification(SequenceClassification):
    """Student classifier trained against saved teacher logits."""

    temperature = 1.0
    alpha = 0.5

    @classmethod
    def configure(cls, udp):
        cls.temperature = float(udp.get("temperature", 1.0))
        cls.alpha = float(udp.get("alpha", 0.5))
        return cls

    @staticmethod
    def loss_fn(outputs, batch):
        cls = DistillatorySequenceClassification
        loss = losses.vanilla_kd_loss(
            outputs["logits"], batch["teacher_logits"], batch["label_ids"],
            temperature=cls.temperature, alpha=cls.alpha)
        return {"loss": loss}
