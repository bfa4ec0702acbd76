"""Few-shot predictor (capability parity: reference
easynlp/fewshot_learning/fewshot_predictor.py — apply the pattern, read MLM
logits at the mask position, gather verbalizer token ids into class probs)."""

import json
import os

import numpy as np

from easynlp_tpu.core.predictor import Predictor, PyModelPredictor
from easynlp_tpu.modelzoo.models.bert import BertTokenizer
from easynlp_tpu.utils.io_utils import io


class FewshotPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence=None,
                 second_sequence=None, sequence_length=128, batch_size=32,
                 pattern=None, label_desc=None, **_):
        self.tokenizer = BertTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence
        self.second_sequence = second_sequence
        self.sequence_length = sequence_length
        tc = os.path.join(model_dir, "train_config.json")
        saved_udp = {}
        if io.exists(tc):
            from easynlp_tpu.utils.global_vars import (
                parse_user_defined_parameters)
            with io.open(tc) as f:
                saved_udp = parse_user_defined_parameters(
                    json.load(f).get("user_defined_parameters"))
        self.pattern = pattern or saved_udp.get("pattern", "{sent1} {mask}")
        label_desc = label_desc or saved_udp.get("label_desc")
        label_path = os.path.join(model_dir, "label_mapping.json")
        mapping = {}
        if io.exists(label_path):
            with io.open(label_path) as f:
                mapping = json.load(f)
        self.labels = [k for k, _ in sorted(mapping.items(),
                                            key=lambda kv: kv[1])]
        descs = (label_desc.split(",") if label_desc else self.labels)
        self.verbalizer_ids = np.asarray(
            [self.tokenizer.convert_tokens_to_ids(
                self.tokenizer.tokenize(d) or [self.tokenizer.unk_token])[0]
             for d in descs], np.int32)
        self.model_predictor = PyModelPredictor(
            app,
            input_keys=[("input_ids", np.int32), ("attention_mask", np.int32),
                        ("token_type_ids", np.int32),
                        ("mask_positions", np.int32),
                        ("verbalizer_ids", np.int32)],
            output_keys=["logits", "probabilities"],
            batch_size=batch_size)

    def preprocess(self, in_data):
        tok = self.tokenizer
        max_len = self.sequence_length
        ids_all, mask_all, pos_all = [], [], []
        for text in in_data[self.first_sequence]:
            parts = self.pattern.replace(
                "{sent1}", str(text)).split("{mask}")
            left = tok.convert_tokens_to_ids(tok.tokenize(parts[0]))
            right = tok.convert_tokens_to_ids(
                tok.tokenize(parts[1])) if len(parts) > 1 else []
            budget = max_len - 3
            left = left[:max(budget - len(right), 0)]
            right = right[:budget - len(left)]
            ids = [tok.cls_token_id] + left + [tok.mask_token_id] + right \
                + [tok.sep_token_id]
            pos_all.append(1 + len(left))
            mask_all.append([1] * len(ids) + [0] * (max_len - len(ids)))
            ids_all.append(ids + [tok.pad_token_id] * (max_len - len(ids)))
        out = dict(in_data)
        out["input_ids"] = np.asarray(ids_all, np.int32)
        out["attention_mask"] = np.asarray(mask_all, np.int32)
        out["token_type_ids"] = np.zeros_like(out["input_ids"])
        out["mask_positions"] = np.asarray(pos_all, np.int32)
        out["verbalizer_ids"] = np.broadcast_to(
            self.verbalizer_ids,
            (len(ids_all),) + self.verbalizer_ids.shape).copy()
        return out

    def predict(self, in_data):
        return self.model_predictor.predict(in_data)

    def postprocess(self, result):
        result = dict(result)
        probs = np.asarray(result["probabilities"], np.float32)
        result["predictions"] = [
            self.labels[int(p.argmax())] if self.labels else str(int(p.argmax()))
            for p in probs]
        result["probabilities"] = [" ".join("%.6f" % x for x in p)
                                   for p in probs]
        return result
