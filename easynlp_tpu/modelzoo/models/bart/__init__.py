from easynlp_tpu.modelzoo.models.bart.configuration_bart import (  # noqa: F401
    BartConfig,
    PegasusConfig,
    RandengConfig,
)
from easynlp_tpu.modelzoo.models.bart.modeling_bart import (  # noqa: F401
    BartForConditionalGeneration,
)
