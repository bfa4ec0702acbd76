"""MRC dataset (capability parity: reference easynlp/appzoo/
machine_reading_comprehension/data.py — question+context rows with answer
text/char-start; token-level span labels located by matching the tokenised
answer inside the tokenised context)."""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset


class MRCDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=384,
                 input_schema=None, first_sequence="question",
                 second_sequence="context", label_name="answer",
                 answer_name=None, qas_id_name="qas_id", **kwargs):
        kwargs.pop("label_enumerate_values", None)
        kwargs.pop("multi_label", None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.question_col = first_sequence
        self.context_col = second_sequence
        self.answer_col = answer_name or label_name
        self.qas_id_name = qas_id_name
        self._build_features()

    def _find_span(self, context_ids, answer_ids):
        """First occurrence of answer_ids within context_ids (token match)."""
        n, m = len(context_ids), len(answer_ids)
        if m == 0 or m > n:
            return -1
        for i in range(n - m + 1):
            if context_ids[i:i + m] == answer_ids[:]:
                return i
        return -1

    def _build_features(self):
        tok = self.tokenizer
        max_len = self.max_seq_length
        feats = {"input_ids": [], "attention_mask": [], "token_type_ids": [],
                 "start_positions": [], "end_positions": []}
        for row in self.rows:
            r = self.parse_row(row)
            q = str(r.get(self.question_col, ""))
            c = str(r.get(self.context_col, ""))
            a = str(r.get(self.answer_col, ""))
            q_ids = tok.convert_tokens_to_ids(tok.tokenize(q))
            c_ids = tok.convert_tokens_to_ids(tok.tokenize(c))
            a_ids = tok.convert_tokens_to_ids(tok.tokenize(a)) if a else []
            # [CLS] q [SEP] c [SEP]
            budget = max_len - 3 - len(q_ids)
            c_ids = c_ids[:max(budget, 0)]
            ids = [tok.cls_token_id] + q_ids + [tok.sep_token_id] + c_ids \
                + [tok.sep_token_id]
            tt = [0] * (len(q_ids) + 2) + [1] * (len(c_ids) + 1)
            mask = [1] * len(ids)
            span = self._find_span(c_ids, a_ids)
            ctx_offset = len(q_ids) + 2
            if span >= 0:
                start, end = ctx_offset + span, ctx_offset + span + len(a_ids) - 1
            else:
                start = end = 0  # CLS = unanswerable (reference clamp semantics)
            pad = max_len - len(ids)
            ids += [tok.pad_token_id] * pad
            tt += [0] * pad
            mask += [0] * pad
            feats["input_ids"].append(ids)
            feats["attention_mask"].append(mask)
            feats["token_type_ids"].append(tt)
            feats["start_positions"].append(start)
            feats["end_positions"].append(end)
        self.features = {k: np.asarray(v, np.int32) for k, v in feats.items()}

    def __getitem__(self, idx):
        return {k: v[idx] for k, v in self.features.items()}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
