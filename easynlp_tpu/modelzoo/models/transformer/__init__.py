from easynlp_tpu.modelzoo.models.transformer.configuration_transformer import (  # noqa: F401
    TransformerConfig,
)
from easynlp_tpu.modelzoo.models.transformer.modeling_transformer import (  # noqa: F401
    TransformerGeneratorModel,
    convert_transformer_state_dict,
)
from easynlp_tpu.modelzoo.models.transformer.tokenization_transformer import (  # noqa: F401
    TransformerTokenizer,
)
