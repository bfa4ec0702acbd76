"""CLUE task preprocessors (JSONL → shape-static features).

Capability parity: reference benchmarks/clue/preprocess.py:125-389 —
per-task column mapping, label enumerations, CSL keyword-join pair
construction (:320-333) and WSC span markup with `_`/`[ ]` markers
(:262-290). Input is the standard CLUE JSONL layout (train.json /
dev.json / test.json, one object per line) read from a local directory
(zero-egress: no remote datahub fetch; download CLUE once and point
--data_dir at it).
"""

import json
import os

import numpy as np


class ClueProcessor:
    """Base: single/pair text classification over CLUE JSONL."""

    text_keys = ("sentence",)
    label_key = "label"

    def __init__(self, tokenizer, max_seq_length=128):
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        labels = self.get_labels()
        self.label2id = {l: i for i, l in enumerate(labels)}
        self.id2label = {i: l for i, l in enumerate(labels)}

    # -- per-task hooks -------------------------------------------------------
    def get_labels(self):
        raise NotImplementedError

    def example_texts(self, rec):
        """(text_a, text_b|None) for one JSONL record."""
        keys = self.text_keys
        if len(keys) == 1:
            return str(rec[keys[0]]), None
        return str(rec[keys[0]]), str(rec[keys[1]])

    # -- pipeline -------------------------------------------------------------
    def read_split(self, data_dir, split):
        path = os.path.join(data_dir, "%s.json" % split)
        recs = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    recs.append(json.loads(line))
        return recs

    def featurize(self, recs, with_labels=True):
        texts_a, texts_b, label_ids = [], [], []
        for rec in recs:
            a, b = self.example_texts(rec)
            texts_a.append(a)
            texts_b.append(b)
            if with_labels and self.label_key in rec:
                label_ids.append(self.label2id[str(rec[self.label_key])])
        pairs = None if texts_b[0] is None else texts_b
        enc = self.tokenizer(texts_a, text_pair=pairs,
                             max_length=self.max_seq_length)
        feats = {k: np.asarray(v, np.int32) for k, v in enc.items()}
        if label_ids and len(label_ids) == len(recs):
            feats["label_ids"] = np.asarray(label_ids, np.int32)
        return feats


class AfqmcProcessor(ClueProcessor):
    text_keys = ("sentence1", "sentence2")

    def get_labels(self):
        return ["0", "1"]


class CmnliProcessor(ClueProcessor):
    text_keys = ("sentence1", "sentence2")

    def get_labels(self):
        return ["contradiction", "entailment", "neutral"]


class OcnliProcessor(CmnliProcessor):
    pass


class TnewsProcessor(ClueProcessor):
    text_keys = ("sentence",)

    def get_labels(self):
        # reference preprocess.py:118-124: 100..116 minus 105/111
        return [str(100 + i) for i in range(17) if i not in (5, 11)]


class IflytekProcessor(ClueProcessor):
    text_keys = ("sentence",)

    def get_labels(self):
        return [str(i) for i in range(119)]


class CslProcessor(ClueProcessor):
    """Keyword-match: text_a = space-joined keywords, text_b = abstract
    (reference preprocess.py:320-333)."""

    def get_labels(self):
        return ["0", "1"]

    def example_texts(self, rec):
        return " ".join(rec["keyword"]), str(rec["abst"])


class WscProcessor(ClueProcessor):
    """Coreference as classification: pronoun wrapped in [ ], candidate
    span in _ _ (reference preprocess.py:262-290)."""

    def get_labels(self):
        return ["true", "false"]

    def example_texts(self, rec):
        text = rec["text"]
        tgt = rec["target"]
        query, query_idx = tgt["span1_text"], tgt["span1_index"]
        pron, pron_idx = tgt["span2_text"], tgt["span2_index"]
        assert text[pron_idx:pron_idx + len(pron)] == pron
        assert text[query_idx:query_idx + len(query)] == query
        chars = list(text)
        if pron_idx > query_idx:
            chars.insert(query_idx, "_")
            chars.insert(query_idx + len(query) + 1, "_")
            chars.insert(pron_idx + 2, "[")
            chars.insert(pron_idx + len(pron) + 2 + 1, "]")
        else:
            chars.insert(pron_idx, "[")
            chars.insert(pron_idx + len(pron) + 1, "]")
            chars.insert(query_idx + 2, "_")
            chars.insert(query_idx + len(query) + 2 + 1, "_")
        return "".join(chars), None


TASKS = {
    "afqmc": AfqmcProcessor,
    "tnews": TnewsProcessor,
    "iflytek": IflytekProcessor,
    "ocnli": OcnliProcessor,
    "cmnli": CmnliProcessor,
    "csl": CslProcessor,
    "wsc": WscProcessor,
}

# reference benchmarks/clue/README.md settings table
RECIPES = {
    "afqmc": dict(learning_rate=5e-5, micro_batch_size=48,
                  sequence_length=256, epoch_num=5.0),
    "cmnli": dict(learning_rate=3e-5, micro_batch_size=16,
                  sequence_length=128, epoch_num=5.0),
    "csl": dict(learning_rate=1e-5, micro_batch_size=32,
                sequence_length=256, epoch_num=5.0),
    "iflytek": dict(learning_rate=5e-5, micro_batch_size=16,
                    sequence_length=128, epoch_num=5.0),
    "ocnli": dict(learning_rate=3e-5, micro_batch_size=16,
                  sequence_length=128, epoch_num=5.0),
    "tnews": dict(learning_rate=5e-5, micro_batch_size=32,
                  sequence_length=128, epoch_num=5.0),
    "wsc": dict(learning_rate=5e-5, micro_batch_size=32,
                sequence_length=128, epoch_num=50.0),
}
