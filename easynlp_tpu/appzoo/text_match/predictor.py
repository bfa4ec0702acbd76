"""Text match predictors (reference easynlp/appzoo/text_match/predictor.py:
cross-encoder probs → labels; two-tower similarity/embedding output)."""

import numpy as np

from easynlp_tpu.appzoo.sequence_classification.predictor import (
    SequenceClassificationPredictor,
)
from easynlp_tpu.core.predictor import Predictor, PyModelPredictor
from easynlp_tpu.modelzoo.models.bert import BertTokenizer


class TextMatchPredictor(SequenceClassificationPredictor):
    pass


class TextMatchTwoTowerPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence=None, second_sequence=None,
                 sequence_length=128, batch_size=32, **_):
        self.tokenizer = BertTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence
        self.second_sequence = second_sequence
        self.sequence_length = sequence_length
        self.model_predictor = PyModelPredictor(
            app,
            input_keys=[("input_ids", np.int32), ("attention_mask", np.int32),
                        ("token_type_ids", np.int32),
                        ("input_ids_b", np.int32), ("attention_mask_b", np.int32),
                        ("token_type_ids_b", np.int32)],
            output_keys=["similarity", "embeddings", "embeddings_b"],
            batch_size=batch_size)

    def preprocess(self, in_data):
        enc_a = self.tokenizer([str(t) for t in in_data[self.first_sequence]],
                               max_length=self.sequence_length)
        enc_b = self.tokenizer([str(t) for t in in_data[self.second_sequence]],
                               max_length=self.sequence_length)
        out = dict(in_data)
        out.update({k: np.asarray(v, np.int32) for k, v in enc_a.items()})
        out.update({k + "_b": np.asarray(v, np.int32) for k, v in enc_b.items()})
        return out

    def predict(self, in_data):
        return self.model_predictor.predict(in_data)

    def postprocess(self, result):
        result = dict(result)
        sims = np.asarray(result["similarity"])
        result["predictions"] = [int(s > 0.5) for s in sims]
        result["similarity"] = ["%.6f" % s for s in sims]
        return result
