"""CLUE harness: preprocessors + train→evaluate→predict e2e on fixtures.

Mirrors the reference's black-box benchmark flow (reference
benchmarks/clue/main.py) on tiny JSONL fixtures.
"""

import json
import os

import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture()
def vocab_path(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "_", "[", "]"] + \
        list("abcdefghijklmnopqrstuvwxyz0123456789这是一条测试句子关键词摘要他它")
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab), encoding="utf-8")
    return p


@pytest.fixture()
def vocab_tokenizer(vocab_path):
    from easynlp_tpu.modelzoo.models.bert.tokenization_bert import (
        BertTokenizer)
    return BertTokenizer(str(vocab_path))


def test_wsc_span_markup(vocab_tokenizer):
    from benchmarks.clue.preprocess import WscProcessor
    proc = WscProcessor(vocab_tokenizer, max_seq_length=32)
    rec = {"text": "abc def ghi",
           "target": {"span1_text": "abc", "span1_index": 0,
                      "span2_text": "ghi", "span2_index": 8},
           "label": "true"}
    text, pair = proc.example_texts(rec)
    # reference preprocess.py:262-290: candidate in _ _, pronoun in [ ]
    assert text == "_abc_ def [ghi]"
    assert pair is None


def test_csl_keyword_join(vocab_tokenizer):
    from benchmarks.clue.preprocess import CslProcessor
    proc = CslProcessor(vocab_tokenizer, max_seq_length=32)
    a, b = proc.example_texts(
        {"keyword": ["k1", "k2"], "abst": "摘要", "label": "1"})
    assert a == "k1 k2" and b == "摘要"


def test_label_enumerations():
    from benchmarks.clue.preprocess import (IflytekProcessor, TnewsProcessor)
    assert len(TnewsProcessor.get_labels(None)) == 15
    assert "105" not in TnewsProcessor.get_labels(None)
    assert len(IflytekProcessor.get_labels(None)) == 119


def test_clue_train_eval_predict_e2e(tmp_path, vocab_path, vocab_tokenizer):
    """Drive benchmarks/clue/main.py train -> evaluate -> predict on a
    tiny AFQMC-format fixture with a tiny BERT."""
    from easynlp_tpu.testing import tiny_bert_config

    data = tmp_path / "afqmc"
    data.mkdir()
    rng = np.random.RandomState(0)
    rows = [{"sentence1": "这是一条测试", "sentence2": "这是测试句子",
             "label": str(rng.randint(2))} for _ in range(16)]
    for split in ("train", "dev", "test"):
        with open(data / ("%s.json" % split), "w", encoding="utf-8") as f:
            for r in rows:
                rec = dict(r)
                if split == "test":
                    rec.pop("label")
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")

    model = tmp_path / "tiny-bert"
    model.mkdir()
    cfg = tiny_bert_config(vocab_size=vocab_tokenizer.vocab_size)
    (model / "config.json").write_text(json.dumps(
        {**cfg.to_dict(), "model_type": "bert"}))
    import shutil
    shutil.copy(vocab_path, model / "vocab.txt")

    ckpt = tmp_path / "ckpt"
    udp = ("task_name=afqmc data_dir=%s pretrain_model_name_or_path=%s"
           % (data, model))
    base = ["clue_main",
            "--user_defined_parameters", udp,
            "--micro_batch_size", "8", "--sequence_length", "16",
            "--epoch_num", "1", "--logging_steps", "2",
            "--checkpoint_dir", str(ckpt)]
    # in-process like tests/test_e2e_classification.py (the subprocess route
    # re-pays whole-program XLA-CPU compiles; in-process reuses the warm
    # backend + compile cache)
    from benchmarks.clue import main as clue_main
    from easynlp_tpu.utils import global_vars
    for mode in ("train", "evaluate", "predict"):
        global_vars._GLOBAL_ARGS = None
        old_argv = sys.argv
        sys.argv = base + ["--mode", mode,
                           "--outputs", str(tmp_path / "pred.tsv")]
        try:
            clue_main.main()
        finally:
            sys.argv = old_argv
    assert (ckpt / "flax_params.msgpack").exists()
    preds = (tmp_path / "pred.tsv").read_text().strip().splitlines()
    assert len(preds) == 16 and set(preds) <= {"0", "1"}
