from easynlp_tpu.modelzoo.models.bert.configuration_bert import (  # noqa: F401
    BertConfig,
    RobertaConfig,
)
from easynlp_tpu.modelzoo.models.bert.modeling_bert import (  # noqa: F401
    BertForMaskedLM,
    BertMLMHead,
    BertModel,
)
from easynlp_tpu.modelzoo.models.bert.tokenization_bert import (  # noqa: F401
    BertTokenizer,
)
