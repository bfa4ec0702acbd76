"""Kangaroo (knowledge-enhanced w/ concept embeddings).

Capability parity: reference easynlp/modelzoo/models/kangaroo/ — Alibaba's
concept-graph-enhanced BERT. Model-side it shares DKPLM's injection seam
(projected external embeddings added at entity positions + contrastive
samples from the entity tree); the distinctive parts — Poincaré concept
embeddings and entity-tree sampling — are data-pipeline components (reference
examples/kangaroo_pretraining, the repo's only Cython), tracked as round-2
data work."""

from easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm import (
    DKPLMForPreTraining,
    DKPLMModel,
)
from easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm import DKPLMConfig


class KangarooConfig(DKPLMConfig):
    model_type = "kangaroo"


class KangarooModel(DKPLMModel):
    pass


class KangarooForPreTraining(DKPLMForPreTraining):
    pass
