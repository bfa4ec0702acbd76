from easynlp_tpu.modelzoo.models.kangaroo.modeling_kangaroo import (  # noqa
    KangarooConfig,
    KangarooForPreTraining,
    KangarooModel,
)
