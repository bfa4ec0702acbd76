from easynlp_tpu.modelzoo.models.pegasus.tokenization_pegasus import (  # noqa: F401
    PegasusTokenizer,
)
