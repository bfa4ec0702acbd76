"""BERT config (capability parity: reference easynlp/modelzoo/models/bert/
configuration_bert.py — same attribute names so reference config.json files
load unchanged)."""

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig


class BertConfig(PretrainedConfig):
    model_type = "bert"


class RobertaConfig(BertConfig):
    """RoBERTa shares the BERT architecture; differences (pad offset for
    position ids, vocab) are config values (reference models/roberta/)."""
    model_type = "roberta"

    def __init__(self, **kwargs):
        kwargs.setdefault("pad_token_id", 1)
        kwargs.setdefault("bos_token_id", 0)
        kwargs.setdefault("eos_token_id", 2)
        super().__init__(**kwargs)
