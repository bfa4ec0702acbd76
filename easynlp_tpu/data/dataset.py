"""Data layer.

Capability parity: reference easynlp/appzoo/dataset.py (BaseDataset :37 —
source sniffing, schema rows, contract convert_single_row_to_example/batch_fn/
label_enumerate_values; GeneralDataset :302 over HF datasets). TPU-native
re-design:

- examples are *pre-featurised once* into fixed-shape numpy arrays at dataset
  construction (the reference tokenises per __getitem__ on N dataloader
  workers; a TPU chip starves on that — SURVEY.md §7.3 host-throughput note);
- every batch has identical shapes (pad/truncate to sequence_length, drop-last
  for train, pad-final-batch with a `_valid` mask for eval/predict) because
  XLA recompiles on shape change;
- multi-host sharding = row slicing by (process_index, num_processes),
  replacing DistributedSampler.
"""

import numpy as np

from easynlp_tpu.utils import parse_row_by_schema, parse_schema
from easynlp_tpu.utils.io_utils import io
from easynlp_tpu.utils.logger import logger


class BaseDataset:
    """Contract: subclasses implement `convert_single_row_to_example(row_dict)`
    returning a dict of python/numpy values, and `batch_fn(list_of_examples)`
    returning a dict of fixed-shape numpy arrays. Subclasses may instead
    override `build_features(rows)` for vectorised featurisation."""

    def __init__(self, data_file, input_schema=None, skip_first_line=False,
                 process_index=0, num_processes=1, **kwargs):
        self.data_file = data_file
        self.input_schema = input_schema
        self.schema = parse_schema(input_schema) if input_schema else None
        self.process_index = process_index or 0
        self.num_processes = num_processes or 1
        self.kwargs = kwargs
        rows = self.read_rows(data_file)
        if skip_first_line and len(rows):
            rows = rows[1:]
        # odps read_rows returns its per-process table slice already
        if self.num_processes > 1 and not \
                str(data_file).startswith("odps://"):
            rows = rows[self.process_index::self.num_processes]
        self.rows = rows

    # -- source reading (local/OSS via io seam; odps reader is a backend) ----
    def read_rows(self, data_file):
        if str(data_file).startswith("odps://"):
            # common_io TableReader slice per process (reference
            # appzoo/dataset.py:68-134); odps://local/ is the test emulation
            from easynlp_tpu.data.odps_reader import read_odps_rows
            return read_odps_rows(str(data_file),
                                  process_index=self.process_index,
                                  num_processes=self.num_processes)
        # plain local files: LAZY list-like row views (len/index/slice) —
        # rows stay on disk behind an mmap, RAM holds 8 bytes/row of index,
        # so multi-GB base64-image TSVs (clip/diffusion) don't get
        # materialised. C++ reader when built, pure-Python mmap otherwise.
        if "://" not in str(data_file):
            try:
                from easynlp_tpu.data.native_reader import (NativeLazyRows,
                                                            available)
                if available():
                    return NativeLazyRows(data_file)
            except Exception:
                pass  # fall back to the Python path
            from easynlp_tpu.data.lazy_loader import LazyRows
            return LazyRows(data_file)
        with io.open(data_file) as f:
            return [line.rstrip("\n") for line in f if line.strip()]

    def parse_row(self, row):
        if self.schema:
            return parse_row_by_schema(row, self.schema)
        return {"text": row}

    # -- contract -------------------------------------------------------------
    def convert_single_row_to_example(self, row_dict):
        raise NotImplementedError

    def batch_fn(self, examples):
        out = {}
        for key in examples[0]:
            out[key] = np.stack([np.asarray(e[key]) for e in examples])
        return out

    @property
    def label_enumerate_values(self):
        return []

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        return self.convert_single_row_to_example(self.parse_row(self.rows[idx]))


class GeneralDataset(BaseDataset):
    """Adapts a HF `datasets` arrow dataset to the app contract (reference
    appzoo/dataset.py:302-391).

    With a tokenizer it reproduces the reference's auto-inference: first /
    second sequence from column order, label list from the ClassLabel
    feature, and the `ner_tags` sequence-labeling branch (:331-351); rows
    featurise to shape-static numpy dicts. Without a tokenizer it stays a
    plain row adapter (`parse_row`)."""

    def __init__(self, hf_dataset, tokenizer=None, max_seq_length=128,
                 **kwargs):
        self.hf_dataset = hf_dataset
        self.kwargs = kwargs
        self.schema = None
        self.rows = list(range(len(hf_dataset)))
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.first_sequence = self.second_sequence = self.label_name = None
        self._label_enumerate_values = None
        features = getattr(hf_dataset, "features", None)
        cols = list(features.keys()) if features else []
        if features and "ner_tags" in cols:
            self.first_sequence = cols[1] if len(cols) > 1 else cols[0]
            self.label_name = "ner_tags"
            feat = features["ner_tags"]
            inner = getattr(feat, "feature", feat)
            if hasattr(inner, "names"):
                self._label_enumerate_values = list(inner.names)
        elif features and "label" in cols:
            # choose sequences from the non-label columns so datasets whose
            # label column comes first (e.g. HF yelp_review_full: [label,
            # text]) don't tokenize the label string as the input text
            text_cols = [c for c in cols if c != "label"]
            self.first_sequence = text_cols[0] if text_cols else cols[0]
            if len(text_cols) > 1:
                self.second_sequence = text_cols[1]
            self.label_name = "label"
            feat = features["label"]
            if hasattr(feat, "names"):
                self._label_enumerate_values = list(feat.names)
        if self._label_enumerate_values is None and self.label_name:
            # one vectorised column read — per-row hf_dataset[i] decodes the
            # whole arrow row each time (minutes on 1M-row datasets)
            col = hf_dataset[self.label_name]
            seen = sorted({str(v) for v in col
                           if not isinstance(v, list)})
            self._label_enumerate_values = seen or None

    @property
    def label_enumerate_values(self):
        return self._label_enumerate_values

    def parse_row(self, row_idx):
        return dict(self.hf_dataset[int(row_idx)])

    def __getitem__(self, idx):
        row = self.parse_row(self.rows[idx])
        if self.tokenizer is None:
            return row
        import numpy as np
        label = row.get(self.label_name) if self.label_name else None
        if isinstance(label, list):
            # per-token labels need subword alignment — that featurisation
            # lives in the sequence_labeling app's dataset; a stringified
            # list here would silently train on garbage
            raise ValueError(
                "GeneralDataset with a tokenizer cannot featurise "
                "sequence-labeling rows (list-valued %r); use "
                "appzoo.sequence_labeling's dataset, which aligns labels "
                "to first subwords" % self.label_name)
        text_a = row[self.first_sequence]
        if isinstance(text_a, list):  # pre-split tokens column
            text_a = " ".join(str(t) for t in text_a)
        text_b = row.get(self.second_sequence) if self.second_sequence \
            else None
        if isinstance(text_b, list):
            text_b = " ".join(str(t) for t in text_b)
        enc = self.tokenizer(str(text_a),
                             text_pair=text_b,
                             max_length=self.max_seq_length)
        ex = {k: np.asarray(v, np.int32).reshape(-1)
              for k, v in enc.items()}
        if self.label_name and self.label_name in row:
            label = row[self.label_name]
            if isinstance(label, int):
                ex["label_ids"] = np.int32(label)
            else:
                ex["label_ids"] = np.int32(
                    self._label_enumerate_values.index(str(label)))
        return ex

    def batch_fn(self, examples):
        import numpy as np
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


def load_dataset(name, *args, **kwargs):
    """Datahub loading-script registry, then HF cache fallback (reference
    appzoo/dataset.py:393-422; see data/datahub.py)."""
    from easynlp_tpu.data.datahub import load_dataset as datahub_load
    return datahub_load(name, *args, **kwargs)


class DataLoader:
    """Static-shape batching iterator.

    train mode: per-epoch shuffle with a deterministic seed, drop-last.
    eval/predict mode: in-order, final partial batch padded by repeating row 0
    with `_valid`=0 so downstream metrics/writers can drop the padding.
    """

    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 drop_last=None, num_workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = shuffle if drop_last is None else drop_last
        self.epoch = 0
        # parallel per-item featurisation (image decode/resize releases the
        # GIL in PIL's C core, so threads scale on multi-core hosts — the
        # replacement for the reference's torch DataLoader num_workers on the
        # image-heavy apps). 0/1 = synchronous.
        self.num_workers = int(num_workers or 0)
        self._pool = None

    def _fetch(self, idx):
        if self.num_workers > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(
                    max_workers=self.num_workers,
                    thread_name_prefix="dataloader")
            return list(self._pool.map(
                lambda i: self.dataset[int(i)], idx))
        return [self.dataset[int(i)] for i in idx]

    def set_epoch(self, epoch):
        self.epoch = epoch
        # propagate to datasets with epoch-dependent featurisation
        # (e.g. MLM dynamic masking)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        return self.iter_from(0)

    def iter_from(self, start_batch):
        """Iterate from batch index `start_batch` WITHOUT featurising the
        skipped batches — mid-epoch resume must be O(1) in the skip length,
        not hours of tokenization/image-decode for data never trained on.
        The shuffle order is a deterministic function of (seed, epoch), so
        skipping indices reproduces exactly what islice would yield."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        bs = self.batch_size
        n_batches = len(self)
        for b in range(int(start_batch), n_batches):
            idx = order[b * bs:(b + 1) * bs]
            valid = np.ones(len(idx), np.int32)
            if len(idx) < bs:  # pad final batch
                pad = np.zeros(bs - len(idx), order.dtype)
                valid = np.concatenate([valid, np.zeros(bs - len(idx), np.int32)])
                idx = np.concatenate([idx, pad])
            examples = self._fetch(idx)
            batch = self.dataset.batch_fn(examples)
            batch["_valid"] = valid
            yield batch


def get_label_mapping(label_enumerate_values):
    if isinstance(label_enumerate_values, str):
        label_enumerate_values = label_enumerate_values.split(",")
    return {label: i for i, label in enumerate(label_enumerate_values)}
