"""BERT config (capability parity: reference easynlp/modelzoo/models/bert/
configuration_bert.py — same attribute names so reference config.json files
load unchanged)."""

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig


class BertConfig(PretrainedConfig):
    model_type = "bert"


class RobertaConfig(BertConfig):
    """RoBERTa shares the BERT encoder; the semantic deltas are config-driven
    (reference models/roberta/modeling_roberta.py): position ids are derived
    from the attention mask offset past padding_idx
    (create_position_ids_from_input_ids :1553) instead of arange, pad=1, and
    the tokenizer is byte-level BPE (tokenization_roberta.py:37 subclasses
    GPT2Tokenizer)."""
    model_type = "roberta"
    position_ids_from_padding_idx = True

    def __init__(self, **kwargs):
        kwargs.setdefault("pad_token_id", 1)
        kwargs.setdefault("bos_token_id", 0)
        kwargs.setdefault("eos_token_id", 2)
        kwargs.setdefault("type_vocab_size", 1)
        super().__init__(**kwargs)
