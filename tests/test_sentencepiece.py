"""SentencePiece engine: proto parsing, unigram/BPE inference, tokenizer
classes. Oracles: the official protobuf schema (writer) and the HF
`tokenizers` Rust library configured to mirror sentencepiece semantics
(whole-string Unigram lattice over ▁-escaped text)."""

import os

import numpy as np
import pytest

from easynlp_tpu.modelzoo.tokenization_sentencepiece import (
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceModel,
)

PIECES = [
    ("<pad>", 0.0, CONTROL),
    ("</s>", 0.0, CONTROL),
    ("<unk>", 0.0, UNKNOWN),
    ("▁", -2.0, NORMAL),
    ("▁the", -1.0, NORMAL),
    ("▁quick", -3.0, NORMAL),
    ("▁q", -4.5, NORMAL),
    ("uick", -2.5, NORMAL),
    ("▁brown", -3.2, NORMAL),
    ("▁fox", -3.1, NORMAL),
    ("t", -5.0, NORMAL),
    ("h", -5.1, NORMAL),
    ("e", -5.2, NORMAL),
    ("q", -5.3, NORMAL),
    ("u", -5.4, NORMAL),
    ("i", -5.5, NORMAL),
    ("c", -5.6, NORMAL),
    ("k", -5.7, NORMAL),
    ("▁t", -4.0, NORMAL),
    ("he", -4.1, NORMAL),
]


def write_model_proto(path, pieces, model_type=1, add_dummy_prefix=True,
                      remove_extra_whitespaces=True, escape_whitespaces=True,
                      byte_fallback=False, unk_id=2, bos_id=-1, eos_id=1,
                      pad_id=0):
    pb = pytest.importorskip(
        "transformers.utils.sentencepiece_model_pb2_new")
    mp = pb.ModelProto()
    for piece, score, ptype in pieces:
        sp = mp.pieces.add()
        sp.piece = piece
        sp.score = score
        sp.type = ptype
    mp.trainer_spec.model_type = model_type
    mp.trainer_spec.vocab_size = len(pieces)
    mp.trainer_spec.unk_id = unk_id
    mp.trainer_spec.bos_id = bos_id
    mp.trainer_spec.eos_id = eos_id
    mp.trainer_spec.pad_id = pad_id
    mp.trainer_spec.byte_fallback = byte_fallback
    mp.normalizer_spec.name = "nfkc"
    mp.normalizer_spec.add_dummy_prefix = add_dummy_prefix
    mp.normalizer_spec.remove_extra_whitespaces = remove_extra_whitespaces
    mp.normalizer_spec.escape_whitespaces = escape_whitespaces
    with open(path, "wb") as f:
        f.write(mp.SerializeToString())
    return path


@pytest.fixture()
def sp_file(tmp_path):
    return write_model_proto(str(tmp_path / "spiece.model"), PIECES)


def test_proto_parse(sp_file):
    m = SentencePieceModel.from_file(sp_file)
    assert len(m) == len(PIECES)
    assert m.pieces[4] == ("▁the", -1.0, NORMAL)
    assert m.unk_id == 2
    assert m.bos_id == -1            # negative varint decoded correctly
    assert m.model_type == 1
    assert m.add_dummy_prefix and m.escape_whitespaces


def test_unigram_viterbi_picks_best_segmentation(sp_file):
    m = SentencePieceModel.from_file(sp_file)
    # "▁the" (-1.0) beats "▁t"+"he" (-8.1) and chars
    assert m.encode_as_pieces("the") == ["▁the"]
    # "▁quick": whole piece (-3.0) beats "▁q"+"uick" (-7.0)
    assert m.encode_as_pieces("quick") == ["▁quick"]
    assert m.encode_as_pieces("the quick") == ["▁the", "▁quick"]


def test_unigram_matches_hf_tokenizers_lattice(sp_file):
    """Whole-string Unigram lattice parity with the Rust `tokenizers` lib
    configured exactly like sentencepiece (▁ escaping, no pre-tokenizer)."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers

    vocab = [(p, s) for p, s, _ in PIECES]
    tok = Tokenizer(models.Unigram(vocab, unk_id=2, byte_fallback=False))
    tok.normalizer = normalizers.Sequence([
        normalizers.NFKC(),
        normalizers.Prepend("▁"),
        normalizers.Replace(" ", "▁"),
    ])
    m = SentencePieceModel.from_file(sp_file)
    for text in ("the quick brown fox", "the", "quick quick", "thequick",
                 "he the", "fox fox fox", "t h e"):
        ours = m.encode_as_pieces(text)
        theirs = tok.encode(text).tokens
        assert ours == theirs, (text, ours, theirs)


def test_unigram_unknown_fusing(sp_file):
    m = SentencePieceModel.from_file(sp_file)
    # consecutive unknown chars collapse into ONE unk id (sp semantics)
    ids = m.encode("the ZZZ the")
    pieces = [m.pieces[i][0] if i != m.unk_id else "<unk>" for i in ids]
    assert pieces.count("<unk>") == 1
    assert pieces[0] == "▁the" and pieces[-1] == "▁the"


def test_byte_fallback(tmp_path):
    pieces = list(PIECES) + [("<0x%02X>" % b, -6.0, BYTE) for b in range(256)]
    path = write_model_proto(str(tmp_path / "bf.model"), pieces,
                             byte_fallback=True)
    m = SentencePieceModel.from_file(path)
    ids = m.encode("the é")   # é not in vocab → 2 utf-8 byte pieces
    pieces_out = [m.pieces[i][0] for i in ids]
    assert pieces_out[0] == "▁the"
    assert pieces_out[-2:] == ["<0xC3>", "<0xA9>"]
    # decode reassembles the utf-8
    assert m.decode(ids) == "the é"


def test_bpe_merges(tmp_path):
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("▁", -1.0, NORMAL),
        ("a", -2.0, NORMAL),
        ("b", -2.1, NORMAL),
        ("ab", -0.5, NORMAL),
        ("▁ab", -0.2, NORMAL),
        ("abb", -3.0, NORMAL),
    ]
    path = write_model_proto(str(tmp_path / "bpe.model"), pieces,
                             model_type=2, unk_id=0)
    m = SentencePieceModel.from_file(path)
    # "ab" merges first (score -0.5), then "▁"+"ab" → "▁ab" (-0.2)
    assert m.encode_as_pieces("ab") == ["▁ab"]
    assert m.encode_as_pieces("abb") == ["▁ab", "b"]


def test_decode_roundtrip(sp_file):
    m = SentencePieceModel.from_file(sp_file)
    text = "the quick brown fox"
    assert m.decode(m.encode(text)) == text


def test_t5_tokenizer(tmp_path):
    from easynlp_tpu.modelzoo.models.t5 import T5Tokenizer
    path = write_model_proto(str(tmp_path / "spiece.model"), PIECES)
    tok = T5Tokenizer(path, extra_ids=10)
    assert tok.vocab_size == len(PIECES) + 10
    # HF convention: <extra_id_0> is the LAST id
    assert tok._convert_token_to_id("<extra_id_0>") == tok.vocab_size - 1
    assert tok._convert_token_to_id("<extra_id_9>") == tok.vocab_size - 10
    enc = tok.encode_plus("the quick", max_length=8)
    ids = enc["input_ids"]
    eos = tok.eos_token_id
    assert eos == 1
    assert ids[:3] == [4, 5, eos]           # ▁the ▁quick </s>
    assert enc["attention_mask"][:3] == [1, 1, 1]
    assert tok.decode(ids) == "the quick"
    # save/load roundtrip through a checkpoint dir
    tok.save_pretrained(str(tmp_path / "out"))
    tok2 = T5Tokenizer.from_pretrained(str(tmp_path / "out"))
    assert tok2.vocab_size == tok.vocab_size
    assert tok2._encode_core("the quick") == tok._encode_core("the quick")


def test_glm_tokenizer(tmp_path):
    from easynlp_tpu.modelzoo.models.glm import GLMTokenizer
    path = write_model_proto(str(tmp_path / "spiece.model"), PIECES)
    tok = GLMTokenizer(path)
    assert tok._convert_token_to_id("[MASK]") == len(PIECES) + 1
    assert tok.gmask_token_id == len(PIECES) + 2
    assert tok.sop_token_id == len(PIECES) + 4
    ids = tok.encode_plus("the quick", max_length=8)["input_ids"]
    assert ids[0] == tok.cls_token_id
    assert tok.eos_token_id in ids


def test_pegasus_tokenizer(tmp_path):
    from easynlp_tpu.modelzoo.models.pegasus import PegasusTokenizer
    path = write_model_proto(str(tmp_path / "spiece.model"), PIECES)
    tok = PegasusTokenizer(path)
    assert tok.pad_token_id == 0
    assert tok.eos_token_id == 1
    assert tok._convert_token_to_id("<mask_1>") == 2
    assert tok._convert_token_to_id("<mask_2>") == 3
    assert tok._convert_token_to_id("<unk_2>") == 4
    # sp pieces shifted by offset
    assert tok._convert_token_to_id("▁the") == 4 + 103
    enc = tok.encode_plus("the quick", max_length=8)
    assert enc["input_ids"][:3] == [4 + 103, 5 + 103, 1]
    assert tok.decode(enc["input_ids"]) == "the quick"


def test_auto_tokenizer_routes_by_model_type(tmp_path):
    import json

    from easynlp_tpu.modelzoo.models.auto.auto_factory import AutoTokenizer
    d = str(tmp_path / "t5-model")
    os.makedirs(d)
    write_model_proto(os.path.join(d, "spiece.model"), PIECES)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": "t5"}, f)
    tok = AutoTokenizer.from_pretrained(d)
    from easynlp_tpu.modelzoo.models.t5 import T5Tokenizer
    assert isinstance(tok, T5Tokenizer)
    assert tok._encode_core("the") == [4]


def test_native_unigram_byte_parity(sp_file):
    """The C++ Viterbi (native/sp_unigram.cpp) must produce identical ids to
    the pure-Python engine on random text mixes (incl. unknowns)."""
    import random

    from easynlp_tpu.data.fast_sp import FastUnigram
    from easynlp_tpu.modelzoo.tokenization_sentencepiece import (
        SentencePieceModel)

    model = SentencePieceModel.from_file(sp_file)
    fast = FastUnigram.create(model)
    if fast is None:
        import pytest
        pytest.skip("native sp engine unavailable")

    rng = random.Random(0)
    pieces = [p for p, _, t in model.pieces if t == 1]
    corpus = []
    for _ in range(60):
        parts = []
        for _ in range(rng.randint(1, 10)):
            r = rng.random()
            if r < 0.6:
                parts.append(rng.choice(pieces).replace("▁", ""))
            elif r < 0.8:
                parts.append(chr(rng.randint(0x4e00, 0x4e50)))  # unknown CJK
            else:
                parts.append(chr(rng.randint(0x391, 0x3a9)))    # greek
        corpus.append(" ".join(parts))
    corpus += ["", " ", "hello world", "ﬁ ①", "a b"]

    model._fast = False   # force the python path
    for text in corpus:
        normalized = model.normalize(text)
        want = model._encode_unigram(normalized) if normalized else []
        got = fast.encode(normalized) if normalized else []
        assert got == want, (text, got, want)
