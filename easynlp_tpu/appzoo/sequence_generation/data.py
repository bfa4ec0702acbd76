"""Seq2seq generation dataset (capability parity: reference
easynlp/appzoo/sequence_generation/data.py — src/tgt text columns; decoder
teacher forcing with shifted labels)."""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset

IGNORE = -100


class SequenceGenerationDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=128,
                 max_target_length=64, input_schema=None, first_sequence=None,
                 second_sequence=None, label_name=None,
                 decoder_start_token_id=0, **kwargs):
        for k in ("label_enumerate_values", "multi_label"):
            kwargs.pop(k, None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.max_target_length = max_target_length
        self.src_col = first_sequence
        self.tgt_col = second_sequence or label_name
        self.decoder_start_token_id = decoder_start_token_id
        self._build_features()

    def _build_features(self):
        tok = self.tokenizer
        srcs, tgts = [], []
        for row in self.rows:
            r = self.parse_row(row)
            srcs.append(str(r.get(self.src_col, "")))
            tgts.append(str(r.get(self.tgt_col, "")) if self.tgt_col else "")
        enc = tok(srcs, max_length=self.max_seq_length)
        self.features = {
            "input_ids": np.asarray(enc["input_ids"], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        }
        if self.tgt_col:
            t = self.max_target_length
            dec_in = np.full((len(tgts), t), tok.pad_token_id, np.int32)
            labels = np.full((len(tgts), t), IGNORE, np.int32)
            dec_mask = np.zeros((len(tgts), t), np.int32)
            eos = tok.eos_token_id if tok.eos_token_id is not None \
                else tok.sep_token_id
            for i, tgt in enumerate(tgts):
                ids = tok.convert_tokens_to_ids(tok.tokenize(tgt))[:t - 1]
                ids = ids + ([eos] if eos is not None else [])
                shifted = [self.decoder_start_token_id] + ids[:-1]
                n = len(ids)
                dec_in[i, :n] = shifted[:n]
                labels[i, :n] = ids
                dec_mask[i, :n] = 1
            self.features["decoder_input_ids"] = dec_in
            self.features["decoder_attention_mask"] = dec_mask
            self.features["labels"] = labels

    def __getitem__(self, idx):
        return {k: v[idx] for k, v in self.features.items()}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
