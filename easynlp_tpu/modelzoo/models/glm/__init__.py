from easynlp_tpu.modelzoo.models.glm.modeling_glm import (  # noqa: F401
    GLMConfig,
    GLMForConditionalGeneration,
    GLMModel,
    glm_attention_bias,
)
from easynlp_tpu.modelzoo.models.glm.tokenization_glm import (  # noqa: F401
    GLMTokenizer,
)
