"""MRC predictor: best answer span text (reference easynlp/appzoo/
machine_reading_comprehension/predictor.py)."""

import numpy as np

from easynlp_tpu.core.predictor import Predictor, PyModelPredictor
from easynlp_tpu.modelzoo.models.bert import BertTokenizer


class MRCPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence="question",
                 second_sequence="context", sequence_length=384,
                 batch_size=8, max_answer_length=30, **_):
        self.tokenizer = BertTokenizer.from_pretrained(model_dir)
        self.question_col = first_sequence or "question"
        self.context_col = second_sequence or "context"
        self.sequence_length = sequence_length
        self.max_answer_length = max_answer_length
        self.model_predictor = PyModelPredictor(
            app,
            input_keys=[("input_ids", np.int32), ("attention_mask", np.int32),
                        ("token_type_ids", np.int32)],
            output_keys=["start_logits", "end_logits"],
            batch_size=batch_size)

    def preprocess(self, in_data):
        tok = self.tokenizer
        max_len = self.sequence_length
        feats = {"input_ids": [], "attention_mask": [], "token_type_ids": []}
        all_ids = []
        for q, c in zip(in_data[self.question_col], in_data[self.context_col]):
            q_ids = tok.convert_tokens_to_ids(tok.tokenize(str(q)))
            c_ids = tok.convert_tokens_to_ids(tok.tokenize(str(c)))
            c_ids = c_ids[:max(max_len - 3 - len(q_ids), 0)]
            ids = [tok.cls_token_id] + q_ids + [tok.sep_token_id] + c_ids \
                + [tok.sep_token_id]
            tt = [0] * (len(q_ids) + 2) + [1] * (len(c_ids) + 1)
            mask = [1] * len(ids)
            pad = max_len - len(ids)
            feats["input_ids"].append(ids + [tok.pad_token_id] * pad)
            feats["attention_mask"].append(mask + [0] * pad)
            feats["token_type_ids"].append(tt + [0] * pad)
            all_ids.append(ids)
        out = dict(in_data)
        out.update({k: np.asarray(v, np.int32) for k, v in feats.items()})
        out["_raw_ids"] = all_ids
        return out

    def predict(self, in_data):
        raw = in_data.pop("_raw_ids")
        result = self.model_predictor.predict(in_data)
        result["_raw_ids"] = raw
        return result

    def postprocess(self, result):
        starts = np.asarray(result["start_logits"])
        ends = np.asarray(result["end_logits"])
        tt = np.asarray(result["token_type_ids"])
        answers = []
        for i in range(starts.shape[0]):
            # restrict to context (token_type==1), best start<=end<=start+max
            ctx = tt[i] == 1
            s_log = np.where(ctx, starts[i], -1e30)
            e_log = np.where(ctx, ends[i], -1e30)
            best, best_span = -1e30, (0, 0)
            s_top = np.argsort(s_log)[-20:]
            for s in s_top:
                for e in range(s, min(s + self.max_answer_length,
                                      len(e_log))):
                    score = s_log[s] + e_log[e]
                    if score > best:
                        best, best_span = score, (s, e)
            s, e = best_span
            ids = result["_raw_ids"][i]
            span_ids = ids[s:e + 1] if e < len(ids) else []
            answers.append(self.tokenizer.decode(span_ids))
        out = {k: v for k, v in result.items() if not k.startswith("_")}
        out["predictions"] = answers
        out["best_answer"] = answers
        return out
