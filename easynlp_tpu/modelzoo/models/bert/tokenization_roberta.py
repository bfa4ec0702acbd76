"""RoBERTa tokenizer: byte-level BPE with <s>/</s> specials.

Capability parity: reference easynlp/modelzoo/models/roberta/
tokenization_roberta.py:37 — subclasses the GPT-2 BPE tokenizer and changes
only the special tokens and the pair layout (<s> A </s></s> B </s>)."""

from easynlp_tpu.modelzoo.models.gpt2.tokenization_gpt2 import GPT2Tokenizer


class RobertaTokenizer(GPT2Tokenizer):
    def __init__(self, vocab_file, merges_file, bos_token="<s>",
                 eos_token="</s>", unk_token="<unk>", pad_token="<pad>",
                 cls_token="<s>", sep_token="</s>", mask_token="<mask>",
                 **kwargs):
        super().__init__(vocab_file, merges_file, unk_token=unk_token,
                         bos_token=bos_token, eos_token=eos_token,
                         pad_token=pad_token, **kwargs)
        self.cls_token = cls_token
        self.sep_token = sep_token
        self.mask_token = mask_token

    def build_inputs_with_special_tokens(self, ids_a, ids_b=None):
        cls, sep = [self.cls_token_id], [self.sep_token_id]
        if ids_b is None:
            return cls + list(ids_a) + sep
        return cls + list(ids_a) + sep + sep + list(ids_b) + sep

    def create_token_type_ids_from_sequences(self, ids_a, ids_b=None):
        return [0] * len(self.build_inputs_with_special_tokens(ids_a, ids_b))
