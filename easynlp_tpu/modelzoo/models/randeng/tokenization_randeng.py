"""Randeng tokenizer: WordPiece over jieba pre-segmentation.

Capability parity: reference easynlp/modelzoo/models/randeng/
tokenization_randeng.py — a BERT WordPiece vocab where text is first split
by the jieba Chinese word segmenter; words found verbatim in the vocab are
emitted whole, everything else falls through to the standard
basic+wordpiece pipeline. jieba is optional here (not in the TPU image):
without it the tokenizer degrades to plain BertTokenizer behavior, which is
also the reference's effective behavior on non-Chinese text.
"""

from easynlp_tpu.modelzoo.models.bert.tokenization_bert import BertTokenizer

try:
    import jieba  # noqa: F401
    _HAS_JIEBA = True
except ImportError:
    _HAS_JIEBA = False


class RandengTokenizer(BertTokenizer):
    def __init__(self, vocab_file, **kwargs):
        super().__init__(vocab_file, **kwargs)
        # jieba pre-segmentation makes whole-word vocab hits possible; the
        # native fast path has no such hook
        if _HAS_JIEBA:
            self._fast = None

    def _tokenize(self, text):
        if not _HAS_JIEBA:
            return super()._tokenize(text)
        out = []
        for word in jieba.cut(text, HMM=False):
            if word in self.vocab:
                out.append(word)
            else:
                out.extend(super()._tokenize(word))
        return out
