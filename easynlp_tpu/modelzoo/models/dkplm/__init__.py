from easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm import (  # noqa: F401
    DKPLMConfig,
    DKPLMForPreTraining,
    DKPLMModel,
    dkplm_pretrain_loss,
)
