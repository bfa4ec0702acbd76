"""Distillation dataset (capability parity: reference
easynlp/distillation/distill_dataset.py:23-52 — joins a saved teacher-logits
file row-wise into each example; params logits_saved_path / logits_name)."""

import numpy as np

from easynlp_tpu.appzoo.sequence_classification.data import ClassificationDataset
from easynlp_tpu.utils.io_utils import io


class DistillatoryClassificationDataset(ClassificationDataset):
    def __init__(self, data_file, tokenizer, logits_saved_path=None,
                 logits_name=None, is_training=False, **kwargs):
        udp = kwargs.pop("user_defined_parameters", {}) or {}
        logits_saved_path = logits_saved_path or udp.get("logits_saved_path")
        super().__init__(data_file, tokenizer, **kwargs)
        # teacher logits are aligned with the TRAIN table only (reference
        # distill_dataset.py joins at training time)
        if logits_saved_path and is_training:
            self._join_teacher_logits(logits_saved_path)

    def _join_teacher_logits(self, path):
        """Teacher logits file: one row per example, space-separated floats
        (or .npy)."""
        if str(path).endswith(".npy"):
            logits = np.load(path)
        else:
            rows = []
            with io.open(path) as f:
                for line in f:
                    if line.strip():
                        rows.append([float(x) for x in line.split()])
            logits = np.asarray(rows, np.float32)
        if len(logits) != len(self.rows):
            raise ValueError(
                "teacher logits rows (%d) != dataset rows (%d)"
                % (len(logits), len(self.rows)))
        self.features["teacher_logits"] = logits.astype(np.float32)
