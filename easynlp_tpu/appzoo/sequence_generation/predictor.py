"""Generation predictor: source text → generated text (reference
easynlp/appzoo/sequence_generation/predictor.py)."""

import numpy as np

from easynlp_tpu.core.predictor import Predictor


class SequenceGenerationPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence=None,
                 sequence_length=128, batch_size=8, max_decode_length=64,
                 num_beams=1, **_):
        from easynlp_tpu.modelzoo.models.auto import AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence
        self.sequence_length = sequence_length
        self.max_decode_length = max_decode_length
        self.num_beams = num_beams
        self.app = app
        self.batch_size = batch_size

    def preprocess(self, in_data):
        enc = self.tokenizer([str(t) for t in in_data[self.first_sequence]],
                             max_length=self.sequence_length)
        out = dict(in_data)
        out.update({k: np.asarray(v, np.int32) for k, v in enc.items()})
        return out

    def predict(self, in_data):
        import jax.numpy as jnp
        n = len(in_data["input_ids"])
        bs = self.batch_size
        outs = []
        for start in range(0, n, bs):
            ids = in_data["input_ids"][start:start + bs]
            mask = in_data["attention_mask"][start:start + bs]
            real = len(ids)
            if real < bs:
                ids = np.concatenate([ids, np.repeat(ids[-1:], bs - real, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], bs - real, 0)])
            seqs = np.asarray(self.app.generate(
                jnp.asarray(ids), jnp.asarray(mask),
                max_length=self.max_decode_length, num_beams=self.num_beams))
            outs.append(seqs[:real])
        result = dict(in_data)
        result["generated_ids"] = np.concatenate(outs)
        return result

    def postprocess(self, result):
        result = dict(result)
        texts = [self.tokenizer.decode(row, skip_special_tokens=True)
                 for row in result["generated_ids"]]
        result["predictions"] = texts
        result["generated_ids"] = [" ".join(str(x) for x in row)
                                   for row in result["generated_ids"]]
        return result
