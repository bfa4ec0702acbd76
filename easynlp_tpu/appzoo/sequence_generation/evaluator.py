"""Generation evaluator: BLEU-4 + ROUGE-L (capability parity: reference
easynlp/appzoo/sequence_generation/evaluator.py — own implementations, no
external metric deps)."""

import math
from collections import Counter

import numpy as np

from easynlp_tpu.core.evaluator import Evaluator


def bleu4(hypothesis, reference):
    """Sentence BLEU-4 with +1 smoothing (tokens = list of strings/ids)."""
    if not hypothesis or not reference:
        return 0.0
    log_precision = 0.0
    for n in range(1, 5):
        h_ngrams = Counter(tuple(hypothesis[i:i + n])
                           for i in range(len(hypothesis) - n + 1))
        r_ngrams = Counter(tuple(reference[i:i + n])
                           for i in range(len(reference) - n + 1))
        overlap = sum((h_ngrams & r_ngrams).values())
        total = max(sum(h_ngrams.values()), 1)
        log_precision += math.log((overlap + 1.0) / (total + 1.0))
    bp = min(1.0, math.exp(1.0 - len(reference) / max(len(hypothesis), 1)))
    return bp * math.exp(log_precision / 4.0)


def rouge_l(hypothesis, reference):
    """ROUGE-L F1 via longest common subsequence."""
    if not hypothesis or not reference:
        return 0.0
    m, n = len(hypothesis), len(reference)
    dp = np.zeros((m + 1, n + 1), np.int32)
    for i in range(m):
        for j in range(n):
            if hypothesis[i] == reference[j]:
                dp[i + 1, j + 1] = dp[i, j] + 1
            else:
                dp[i + 1, j + 1] = max(dp[i, j + 1], dp[i + 1, j])
    lcs = int(dp[m, n])
    if lcs == 0:
        return 0.0
    p, r = lcs / m, lcs / n
    return 2 * p * r / (p + r)


class SequenceGenerationEvaluator(Evaluator):
    def __init__(self, valid_dataset, max_decode_length=64, num_beams=1,
                 **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(valid_dataset, **kwargs)
        self.tokenizer = valid_dataset.tokenizer
        self.max_decode_length = max_decode_length
        self.num_beams = num_beams

    def evaluate(self, app):
        import jax
        import jax.numpy as jnp
        bleu_sum = rouge_sum = n = 0
        specials = set(self.tokenizer.all_special_ids)
        from easynlp_tpu.appzoo.sequence_generation.predictor import \
            glm_special_ids
        kw = glm_special_ids(self.tokenizer)
        for batch in self.valid_loader:
            valid = batch.pop("_valid").astype(bool)
            src_mask = batch["attention_mask"]
            if "prefix_lengths" in batch:
                # GLM rows carry the teacher-forced TARGET after the prefix
                # (input_ids = [src, gMASK, sop, tgt, eop, pads]) — generate
                # from the source only (also drop the trailing gMASK, which
                # GLM.generate() re-appends), or BLEU/ROUGE would score with
                # the reference answer leaked into the prompt
                t = batch["input_ids"].shape[1]
                src_mask = (np.arange(t)[None, :]
                            < batch["prefix_lengths"][:, None] - 1
                            ).astype(np.int32)
            seqs = np.asarray(app.generate(
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(src_mask),
                max_length=self.max_decode_length,
                num_beams=self.num_beams, **kw))[valid]
            labels = batch["labels"][valid]
            for hyp, ref in zip(seqs, labels):
                h = [int(t) for t in hyp if int(t) not in specials]
                r = [int(t) for t in ref if t != -100
                     and int(t) not in specials]
                bleu_sum += bleu4(h, r)
                rouge_sum += rouge_l(h, r)
                n += 1
        return [("bleu", bleu_sum / max(n, 1)),
                ("rouge_l", rouge_sum / max(n, 1))]
