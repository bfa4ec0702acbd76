"""IE predictor: extract spans with score>0 as 'start,end,type,text'
(reference easynlp/appzoo/information_extraction/predictor.py)."""

import json
import os

import numpy as np

from easynlp_tpu.core.predictor import Predictor, PyModelPredictor
from easynlp_tpu.modelzoo.models.bert import BertTokenizer
from easynlp_tpu.utils.io_utils import io


class InformationExtractionPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence="content",
                 sequence_length=128, batch_size=16, **_):
        self.tokenizer = BertTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence or "content"
        self.sequence_length = sequence_length
        label_path = os.path.join(model_dir, "label_mapping.json")
        mapping = {}
        if io.exists(label_path):
            with io.open(label_path) as f:
                mapping = json.load(f)
        self.id_to_type = {int(v): k for k, v in mapping.items()}
        self.model_predictor = PyModelPredictor(
            app,
            input_keys=[("input_ids", np.int32), ("attention_mask", np.int32),
                        ("token_type_ids", np.int32)],
            output_keys=["span_scores"],
            batch_size=batch_size)

    def preprocess(self, in_data):
        tok = self.tokenizer
        max_len = self.sequence_length
        ids_all, mask_all, texts = [], [], []
        for text in in_data[self.first_sequence]:
            chars = list(str(text))[:max_len - 2]
            ids = [tok.cls_token_id] + tok.convert_tokens_to_ids(chars) \
                + [tok.sep_token_id]
            mask = [1] * len(ids) + [0] * (max_len - len(ids))
            ids += [tok.pad_token_id] * (max_len - len(ids))
            ids_all.append(ids)
            mask_all.append(mask)
            texts.append(str(text))
        out = dict(in_data)
        out["input_ids"] = np.asarray(ids_all, np.int32)
        out["attention_mask"] = np.asarray(mask_all, np.int32)
        out["token_type_ids"] = np.zeros_like(out["input_ids"])
        out["_texts"] = texts
        return out

    def predict(self, in_data):
        texts = in_data.pop("_texts")
        result = self.model_predictor.predict(in_data)
        result["_texts"] = texts
        return result

    def postprocess(self, result):
        scores = np.asarray(result["span_scores"])
        outputs = []
        for i, text in enumerate(result["_texts"]):
            spans = []
            ti, si, ei = np.where(scores[i] > 0)
            for t, s, e in zip(ti, si, ei):
                start, end = int(s) - 1, int(e) - 1  # undo CLS shift
                if 0 <= start <= end < len(text):
                    spans.append("%d,%d,%s,%s" % (
                        start, end, self.id_to_type.get(int(t), str(t)),
                        text[start:end + 1]))
            outputs.append(";".join(spans))
        out = {k: v for k, v in result.items() if not k.startswith("_")}
        out["predictions"] = outputs
        return out
