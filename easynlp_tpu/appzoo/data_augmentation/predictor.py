"""MLM-based data augmentation (capability parity: reference
easynlp/appzoo/data_augmentation/ — predict-only app: mask random tokens and
resample them from the MLM head to synthesise augmented copies)."""

import numpy as np

from easynlp_tpu.core.predictor import Predictor, PyModelPredictor
from easynlp_tpu.modelzoo.models.bert import BertTokenizer


class DataAugmentationPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence=None,
                 sequence_length=128, batch_size=32,
                 augment_count=2, mask_proportion=0.15, seed=0, **_):
        self.tokenizer = BertTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence
        self.sequence_length = sequence_length
        self.augment_count = int(augment_count)
        self.mask_proportion = float(mask_proportion)
        self.rng = np.random.RandomState(seed)
        self.model_predictor = PyModelPredictor(
            app,
            input_keys=[("input_ids", np.int32), ("attention_mask", np.int32),
                        ("token_type_ids", np.int32)],
            output_keys=["logits"],
            batch_size=batch_size)

    def preprocess(self, in_data):
        texts = [str(t) for t in in_data[self.first_sequence]]
        enc = self.tokenizer(texts, max_length=self.sequence_length)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        # replicate each row augment_count times with independent masks
        rep_ids = np.repeat(ids, self.augment_count, axis=0)
        rep_mask = np.repeat(mask, self.augment_count, axis=0)
        special = np.isin(rep_ids, np.asarray(self.tokenizer.all_special_ids))
        maskable = (rep_mask == 1) & ~special
        chosen = maskable & (self.rng.rand(*rep_ids.shape) < self.mask_proportion)
        masked_ids = np.where(chosen, self.tokenizer.mask_token_id, rep_ids)
        out = dict(in_data)
        out["input_ids"] = masked_ids
        out["attention_mask"] = rep_mask
        out["token_type_ids"] = np.zeros_like(masked_ids)
        out["_chosen"] = chosen
        out["_orig_ids"] = rep_ids
        return out

    def predict(self, in_data):
        chosen = in_data.pop("_chosen")
        orig = in_data.pop("_orig_ids")
        result = self.model_predictor.predict(in_data)
        result["_chosen"] = chosen
        result["_orig_ids"] = orig
        return result

    def postprocess(self, result):
        logits = np.asarray(result["logits"])
        chosen, orig = result["_chosen"], result["_orig_ids"]
        sampled = logits.argmax(-1).astype(np.int32)
        new_ids = np.where(chosen, sampled, orig)
        texts = [self.tokenizer.decode(row) for row in new_ids]
        n = len(texts) // self.augment_count
        grouped = ["\t".join(texts[i * self.augment_count:(i + 1) * self.augment_count])
                   for i in range(n)]
        out = {k: v for k, v in result.items() if not k.startswith("_")}
        out["predictions"] = grouped
        out["augmented"] = grouped
        return out
