"""MLM dataset with whole-word masking.

Capability parity: reference easynlp/appzoo/language_modeling/data.py
(whole-word masking :30-46: continuation wordpieces '##x' are grouped with
their word and the whole group is masked together; 15% selection with
80/10/10 mask/random/keep).

TPU note: masking is applied **per epoch on the host** with a deterministic
seed (epoch folded in), giving dynamic masking across epochs while every
batch stays shape-static.
"""

import numpy as np

from easynlp_tpu.data.dataset import BaseDataset

IGNORE = -100


class LanguageModelingDataset(BaseDataset):
    def __init__(self, data_file, tokenizer, max_seq_length=128,
                 input_schema=None, first_sequence=None,
                 mask_probability=0.15, whole_word_masking=True, seed=1234,
                 **kwargs):
        kwargs.pop("label_name", None)
        kwargs.pop("label_enumerate_values", None)
        kwargs.pop("multi_label", None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.first_sequence = first_sequence or "text"
        self.mask_probability = mask_probability
        self.whole_word_masking = whole_word_masking
        self.seed = seed
        self.epoch = 0
        self._build_features()

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _build_features(self):
        texts = []
        for row in self.rows:
            r = self.parse_row(row)
            texts.append(str(r.get(self.first_sequence, r.get("text", ""))))
        enc = self.tokenizer(texts, max_length=self.max_seq_length)
        self.base = {k: np.asarray(v, np.int32) for k, v in enc.items()}
        # word-group ids for whole-word masking: continuation pieces ('##')
        # share the group of the previous token
        ids = self.base["input_ids"]
        vocab_inv = {i: t for t, i in self.tokenizer.get_vocab().items()}
        groups = np.zeros_like(ids)
        for r in range(ids.shape[0]):
            gid = 0
            for c in range(ids.shape[1]):
                tok = vocab_inv.get(int(ids[r, c]), "")
                if not (self.whole_word_masking and tok.startswith("##")):
                    gid += 1
                groups[r, c] = gid
        self.groups = groups
        self.special_mask = np.isin(
            ids, np.asarray(self.tokenizer.all_special_ids))

    def __len__(self):
        return self.base["input_ids"].shape[0]

    def __getitem__(self, idx):
        rng = np.random.RandomState(
            (self.seed + 1000003 * self.epoch + idx) % (2 ** 31))
        ids = self.base["input_ids"][idx].copy()
        labels = np.full_like(ids, IGNORE)
        maskable = ~self.special_mask[idx] & (
            ids != self.tokenizer.pad_token_id)
        groups = self.groups[idx]
        unique_groups = np.unique(groups[maskable])
        if len(unique_groups):
            chosen = unique_groups[
                rng.rand(len(unique_groups)) < self.mask_probability]
            sel = np.isin(groups, chosen) & maskable
            labels[sel] = ids[sel]
            roll = rng.rand(ids.shape[0])
            do_mask = sel & (roll < 0.8)
            do_rand = sel & (roll >= 0.8) & (roll < 0.9)
            ids[do_mask] = self.tokenizer.mask_token_id
            ids[do_rand] = rng.randint(
                0, self.tokenizer.vocab_size, do_rand.sum())
        return {"input_ids": ids,
                "attention_mask": self.base["attention_mask"][idx],
                "token_type_ids": self.base["token_type_ids"][idx],
                "label_ids": labels}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}
