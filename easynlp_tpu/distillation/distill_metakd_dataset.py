"""MetaKD dataset.

Capability parity: reference easynlp/distillation/distill_metakd_dataset.py
:25-190 — classification rows carrying a 'domain' column and a precomputed
'weight' column; optional genre filtering keeps only one domain's rows
(teacher adaptation phase). Emits domain_ids + sample_weights next to the
usual classification features."""

import numpy as np

from easynlp_tpu.appzoo.sequence_classification.data import (
    ClassificationDataset,
)

DEFAULT_DOMAINS = ["books", "dvd", "electronics", "kitchen"]


class MetaKDClassificationDataset(ClassificationDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=128,
                 input_schema=None, first_sequence=None, second_sequence=None,
                 label_name=None, label_enumerate_values=None,
                 user_defined_parameters=None, domain_name="domain",
                 weight_name="weight", **kwargs):
        udp = user_defined_parameters or {}
        self.domain_list = str(udp.get("domain_label",
                                       ",".join(DEFAULT_DOMAINS))).split(",")
        self.domain_idx_mapping = {d: i for i, d in
                                   enumerate(self.domain_list)}
        self.genre = udp.get("genre")
        self._domain_name = domain_name
        self._weight_name = weight_name
        kwargs.pop("multi_label", None)
        # consume skip_first_line here: the genre filter below would drop the
        # header itself (its domain column never matches), and BaseDataset's
        # rows[1:] would then remove the first real data row
        self._skip_first_line = bool(kwargs.pop("skip_first_line", False))
        super().__init__(
            data_file, tokenizer, max_seq_length=max_seq_length,
            input_schema=input_schema, first_sequence=first_sequence,
            second_sequence=second_sequence, label_name=label_name,
            label_enumerate_values=label_enumerate_values,
            skip_first_line=False, **kwargs)

    def read_rows(self, data_file):
        rows = super().read_rows(data_file)
        if self._skip_first_line and rows:
            rows = rows[1:]
        if self.genre and self.genre in self.domain_list:
            # genre filter (reference :108-122, column 'domain')
            kept = []
            for row in rows:
                r = self.parse_row(row)
                if str(r.get(self._domain_name, "")) == self.genre:
                    kept.append(row)
            return kept
        return rows

    def _build_features(self):
        super()._build_features()
        domains, weights = [], []
        for row in self.rows:
            r = self.parse_row(row)
            domains.append(self.domain_idx_mapping.get(
                str(r.get(self._domain_name, "")), 0))
            try:
                weights.append(float(r.get(self._weight_name, 1.0)))
            except (TypeError, ValueError):
                weights.append(1.0)
        self.features["domain_ids"] = np.asarray(domains, np.int32)
        self.features["sample_weights"] = np.asarray(weights, np.float32)
