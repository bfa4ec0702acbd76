"""Sequence labeling predictor (capability parity: reference
easynlp/appzoo/sequence_labeling/predictor.py:70-229 — re-tokenise with
first-subword alignment, argmax per token, map ids back through
label_mapping.json, emit per-token tag strings)."""

import json
import os

import numpy as np

from easynlp_tpu.core.predictor import Predictor, PyModelPredictor
from easynlp_tpu.modelzoo.models.bert import BertTokenizer
from easynlp_tpu.utils.io_utils import io


class SequenceLabelingPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence=None,
                 sequence_length=128, batch_size=32, **_):
        self.tokenizer = BertTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence
        self.sequence_length = sequence_length
        label_path = os.path.join(model_dir, "label_mapping.json")
        if io.exists(label_path):
            with io.open(label_path) as f:
                mapping = json.load(f)
        else:
            mapping = app.label_mapping or {}
        self.id_to_label = {int(v): k for k, v in mapping.items()}
        self.model_predictor = PyModelPredictor(
            app,
            input_keys=[("input_ids", np.int32), ("attention_mask", np.int32),
                        ("token_type_ids", np.int32)],
            output_keys=["predictions"],
            batch_size=batch_size)

    def preprocess(self, in_data):
        tok = self.tokenizer
        max_len = self.sequence_length
        all_ids, all_mask, first_positions, all_tokens = [], [], [], []
        for text in in_data[self.first_sequence]:
            text = str(text)
            tokens = text.split(" ") if " " in text else list(text)
            ids, firsts = [tok.cls_token_id], []
            for token in tokens:
                pieces = tok.tokenize(token) or [tok.unk_token]
                piece_ids = tok.convert_tokens_to_ids(pieces)
                if len(ids) + len(piece_ids) >= max_len - 1:
                    break
                firsts.append(len(ids))
                ids.extend(piece_ids)
            ids.append(tok.sep_token_id)
            mask = [1] * len(ids) + [0] * (max_len - len(ids))
            ids += [tok.pad_token_id] * (max_len - len(ids))
            all_ids.append(ids)
            all_mask.append(mask)
            first_positions.append(firsts)
            all_tokens.append(tokens[:len(firsts)])
        out = dict(in_data)
        out["input_ids"] = np.asarray(all_ids, np.int32)
        out["attention_mask"] = np.asarray(all_mask, np.int32)
        out["token_type_ids"] = np.zeros_like(out["input_ids"])
        out["_first_positions"] = first_positions
        out["_tokens"] = all_tokens
        return out

    def predict(self, in_data):
        firsts = in_data.pop("_first_positions")
        tokens = in_data.pop("_tokens")
        result = self.model_predictor.predict(in_data)
        result["_first_positions"] = firsts
        result["_tokens"] = tokens
        return result

    def postprocess(self, result):
        preds = np.asarray(result["predictions"])
        outputs = []
        for row, firsts in zip(preds, result["_first_positions"]):
            tags = [self.id_to_label.get(int(row[pos]), "O") for pos in firsts]
            outputs.append(" ".join(tags))
        out = {k: v for k, v in result.items() if not k.startswith("_")}
        out["predictions"] = outputs
        return out
