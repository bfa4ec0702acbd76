"""IE dataset (capability parity: reference easynlp/appzoo/
information_extraction/data.py — rows: content + entity annotations
'start,end,type;start,end,type' over character positions; labels become a
[T, S, S] span indicator tensor)."""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset, get_label_mapping


class InformationExtractionDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=128,
                 input_schema=None, first_sequence="content",
                 label_name="entities", label_enumerate_values=None, **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.first_sequence = first_sequence
        self.label_name = label_name
        if label_enumerate_values is None:
            types = set()
            for row in self.rows:
                for ann in self._annotations(self.parse_row(row)):
                    types.add(ann[2])
            self._label_values = sorted(types) or ["ENT"]
        else:
            self._label_values = (label_enumerate_values.split(",")
                                  if isinstance(label_enumerate_values, str)
                                  else list(label_enumerate_values))
        self.label_mapping = get_label_mapping(self._label_values)
        self._build_features()

    @property
    def label_enumerate_values(self):
        return self._label_values

    def _annotations(self, r):
        raw = str(r.get(self.label_name, "") or "")
        out = []
        for part in raw.split(";"):
            bits = part.split(",")
            if len(bits) >= 3:
                out.append((int(bits[0]), int(bits[1]), bits[2]))
        return out

    def _build_features(self):
        tok = self.tokenizer
        max_len = self.max_seq_length
        t = len(self._label_values)
        ids_all, mask_all, labels_all = [], [], []
        for row in self.rows:
            r = self.parse_row(row)
            content = str(r.get(self.first_sequence, ""))
            # char-level tokenisation keeps char offsets == token offsets + 1
            chars = list(content)[:max_len - 2]
            ids = [tok.cls_token_id] + tok.convert_tokens_to_ids(chars) \
                + [tok.sep_token_id]
            mask = [1] * len(ids) + [0] * (max_len - len(ids))
            ids += [tok.pad_token_id] * (max_len - len(ids))
            label = np.zeros((t, max_len, max_len), np.int8)
            for start, end, etype in self._annotations(r):
                ti = self.label_mapping.get(etype)
                s_pos, e_pos = start + 1, end + 1  # CLS shift
                if ti is not None and e_pos < max_len - 1 and s_pos <= e_pos:
                    label[ti, s_pos, e_pos] = 1
            ids_all.append(ids)
            mask_all.append(mask)
            labels_all.append(label)
        self.features = {
            "input_ids": np.asarray(ids_all, np.int32),
            "attention_mask": np.asarray(mask_all, np.int32),
            "token_type_ids": np.zeros((len(ids_all), max_len), np.int32),
            "span_labels": np.asarray(labels_all, np.int8),
        }

    def __getitem__(self, idx):
        return {k: v[idx] for k, v in self.features.items()}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
