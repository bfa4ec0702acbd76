from easynlp_tpu.modelzoo.models.bloom.modeling_bloom import (  # noqa: F401
    BloomConfig,
    BloomForCausalLM,
    BloomModel,
    convert_bloom_state_dict,
)
