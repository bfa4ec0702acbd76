from easynlp_tpu.modelzoo.models.auto.auto_factory import (  # noqa: F401
    AutoConfig,
    AutoModel,
    AutoTokenizer,
    CONFIG_MAPPING,
    MODEL_MAPPING,
    TOKENIZER_MAPPING,
)
