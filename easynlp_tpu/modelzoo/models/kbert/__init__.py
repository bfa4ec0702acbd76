from easynlp_tpu.modelzoo.models.kbert.modeling_kbert import (  # noqa: F401
    KBertConfig,
    KBertModel,
    convert_kbert,
)
