"""Generation predictor: source text → generated text (reference
easynlp/appzoo/sequence_generation/predictor.py).

Decode parameters follow the reference's user_defined_parameters contract
(reference predictor.py:81-88): max_encoder_length, min_decoder_length,
max_decoder_length, no_repeat_ngram_size, num_beams, num_beam_groups,
diversity_penalty. TPU-native extras: speculative_decoding=prompt_lookup
(+ num_draft_tokens, lookup_ngram_size) — draft-model-free speculative
greedy decoding (modelzoo/speculative.py), token-exact, used when beams=1.
"""

import numpy as np

from easynlp_tpu.core.predictor import Predictor


def glm_special_ids(tokenizer):
    """GLM control-token ids from the tokenizer (GLMTokenizer derives
    [gMASK]/<sop>/<eop>/pad from the vocab — they are NEVER the 1/2/3/0
    literal defaults); {} for non-GLM tokenizers so shared callers can
    always merge the result into generate() kwargs."""
    if getattr(tokenizer, "gmask_token_id", None) is None:
        return {}
    return {"gmask_id": int(tokenizer.gmask_token_id),
            "sop_id": int(tokenizer.sop_token_id),
            "eop_id": int(tokenizer.eop_token_id),
            "pad_id": int(getattr(tokenizer, "pad_token_id", 0) or 0)}


class SequenceGenerationPredictor(Predictor):
    def __init__(self, model_dir, app, first_sequence=None,
                 sequence_length=128, batch_size=8, max_decode_length=None,
                 num_beams=None, user_defined_parameters=None, **_):
        from easynlp_tpu.modelzoo.models.auto import AutoTokenizer
        udp = user_defined_parameters or {}
        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self.first_sequence = first_sequence
        self.sequence_length = int(udp.get("max_encoder_length",
                                           sequence_length))
        self.max_decode_length = int(
            max_decode_length if max_decode_length is not None
            else udp.get("max_decoder_length", 64))
        self.min_decode_length = int(udp.get("min_decoder_length", 0))
        self.num_beams = int(num_beams if num_beams is not None
                             else udp.get("num_beams", 1))
        self.no_repeat_ngram_size = int(udp.get("no_repeat_ngram_size", 0))
        self.num_beam_groups = int(udp.get("num_beam_groups", 1)) or 1
        # None = unset (default 1.0 under grouped beams); an explicit 0.0
        # must stay 0.0 — `or` would clobber it
        _dp = udp.get("diversity_penalty")
        self.diversity_penalty = None if _dp is None else float(_dp)
        self.num_return_sequences = min(
            int(udp.get("num_return_sequences", 1)), max(self.num_beams, 1))
        self.speculative = udp.get("speculative_decoding") or None
        self.num_draft_tokens = int(udp.get("num_draft_tokens", 8))
        self.lookup_ngram_size = int(udp.get("lookup_ngram_size", 2))
        self.kv_cache = udp.get("kv_cache_dtype") or None  # 'int8'
        self.app = app
        self.batch_size = batch_size

    def _generate_kwargs(self):
        kw = {"max_length": self.max_decode_length,
              "num_beams": self.num_beams}
        if self.min_decode_length:
            kw["min_length"] = self.min_decode_length
        if self.no_repeat_ngram_size:
            kw["no_repeat_ngram_size"] = self.no_repeat_ngram_size
        if self.num_beam_groups > 1:
            kw["num_beam_groups"] = self.num_beam_groups
            kw["diversity_penalty"] = (1.0 if self.diversity_penalty is None
                                       else self.diversity_penalty)
        if self.num_return_sequences > 1 and self.num_beams > 1:
            kw["num_return_sequences"] = self.num_return_sequences
        if self.speculative:
            kw["speculative"] = self.speculative
            kw["num_draft_tokens"] = self.num_draft_tokens
            kw["ngram_size"] = self.lookup_ngram_size
        if self.kv_cache:
            kw["kv_cache"] = self.kv_cache
        kw.update(glm_special_ids(self.tokenizer))
        return kw

    def preprocess(self, in_data):
        enc = self.tokenizer([str(t) for t in in_data[self.first_sequence]],
                             max_length=self.sequence_length)
        out = dict(in_data)
        out.update({k: np.asarray(v, np.int32) for k, v in enc.items()})
        return out

    def predict(self, in_data):
        import jax.numpy as jnp
        n = len(in_data["input_ids"])
        if n == 0:
            result = dict(in_data)
            result["generated_ids"] = np.zeros((0, 1), np.int32)
            return result
        bs = self.batch_size
        kw = self._generate_kwargs()
        outs = []
        for start in range(0, n, bs):
            ids = in_data["input_ids"][start:start + bs]
            mask = in_data["attention_mask"][start:start + bs]
            real = len(ids)
            if real < bs:
                ids = np.concatenate([ids, np.repeat(ids[-1:], bs - real, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], bs - real, 0)])
            seqs = np.asarray(self.app.generate(
                jnp.asarray(ids), jnp.asarray(mask), **kw))
            outs.append(seqs[:real])
        result = dict(in_data)
        result["generated_ids"] = np.concatenate(outs)
        return result

    def postprocess(self, result):
        result = dict(result)
        gen = result["generated_ids"]
        if gen.ndim == 3:
            # [B, N, T] beam lists (reference predictor.py:176-179:
            # predictions = best beam, beams = "||"-joined top N)
            beam_texts = [[self.tokenizer.decode(b, skip_special_tokens=True)
                           for b in row] for row in gen]
            result["predictions"] = [row[0] for row in beam_texts]
            result["beams"] = ["||".join(row) for row in beam_texts]
            result["generated_ids"] = [
                " ".join(str(x) for x in row[0]) for row in gen]
            return result
        texts = [self.tokenizer.decode(row, skip_special_tokens=True)
                 for row in gen]
        result["predictions"] = texts
        result["beams"] = texts
        result["generated_ids"] = [" ".join(str(x) for x in row)
                                   for row in gen]
        return result
