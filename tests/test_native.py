"""Native C++ components: exact parity with the Python implementations."""

import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))

from easynlp_tpu.data.fast_tokenizer import available as fast_available
from easynlp_tpu.data.native_reader import available as reader_available

CORPUS = [
    "Hello World, this is a TEST!",
    "你好世界，这是一个测试。",
    "mixed 中文 and English WITH UPPER case, punctuation!!! and 123 numbers",
    "   leading/trailing   whitespace   ",
    "naïve café résumé",  # accents
    "symbols @#$%^&*() [brackets] {braces}",
    "",
    "supercalifragilisticexpialidocious unknownwordhere",
    # non-ASCII uppercase: full str.lower() semantics, not just A-Z
    "ГЛАСНОСТЬ и Перестройка",          # Cyrillic
    "ΕΛΛΗΝΙΚΑ ΚΕΦΑΛΑΙΑ",                # Greek (incl. final sigma on lower)
    "ＦＵＬＬＷＩＤＴＨ ＴＥＸＴ",       # fullwidth Latin uppercase
    # unicode punctuation outside the old hand-rolled ranges
    "¡Hola! ¿Qué tal? «quoted» — dash…",
    "a¶b ‰ c⁅d⁆",   # pilcrow, per-mille, brackets
]


@pytest.mark.skipif(not fast_available(), reason="libwordpiece.so not built")
def test_fast_tokenizer_special_tokens_route_to_python(tmp_path):
    """Text embedding special tokens must tokenize like the pure-Python path
    (which protects them via never_split); the native path has no such
    handling and must be bypassed."""
    from make_fixtures import make_pretrained
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    model_dir = make_pretrained(str(tmp_path / "tiny"))
    vocab = os.path.join(model_dir, "vocab.txt")
    fast = BertTokenizer(vocab)
    assert fast._fast is not None
    slow = BertTokenizer(vocab)
    slow._fast = None
    for text in ("hello [SEP] world", "[CLS] leading", "[MASK]",
                 "x [UNK] y [PAD]"):
        assert fast._encode_core(text) == slow._encode_core(text), text


@pytest.mark.skipif(not fast_available(), reason="libwordpiece.so not built")
def test_fast_tokenizer_parity(tmp_path):
    from make_fixtures import make_pretrained
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    model_dir = make_pretrained(str(tmp_path / "tiny"))
    vocab = os.path.join(model_dir, "vocab.txt")

    fast = BertTokenizer(vocab)                      # fast path active
    assert fast._fast is not None
    slow = BertTokenizer(vocab)
    slow._fast = None                                # force python path

    for text in CORPUS:
        f = fast._encode_core(text)
        s = slow._encode_core(text)
        assert f == s, "mismatch on %r: fast=%s slow=%s" % (text, f, s)


@pytest.mark.skipif(not fast_available(), reason="libwordpiece.so not built")
def test_fast_tokenizer_speed(tmp_path):
    from make_fixtures import make_pretrained
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    model_dir = make_pretrained(str(tmp_path / "tiny"))
    tok = BertTokenizer(os.path.join(model_dir, "vocab.txt"))
    texts = CORPUS * 200
    t0 = time.perf_counter()
    for t in texts:
        tok._fast.encode(t)
    fast_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts:
        tok.convert_tokens_to_ids(tok.tokenize(t))
    slow_t = time.perf_counter() - t0
    assert fast_t < slow_t  # native must beat python


@pytest.mark.skipif(not reader_available(), reason="libtsv_reader.so not built")
def test_native_tsv_reader(tmp_path):
    from easynlp_tpu.data.native_reader import NativeTSVReader
    path = str(tmp_path / "t.tsv")
    rows = ["a\t1", "b\t2", "中文行\t3", "last\t4"]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    r = NativeTSVReader(path)
    assert len(r) == 4
    assert r[0] == "a\t1"
    assert r[2] == "中文行\t3"
    assert list(r.rows(1, 4, 2)) == ["b\t2", "last\t4"]
    with pytest.raises(IndexError):
        r[99]
    r.close()
