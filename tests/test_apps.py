import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
from make_fixtures import make_pretrained, make_tsv  # noqa: E402

from easynlp_tpu.modelzoo.models.bert import BertConfig, BertTokenizer
from easynlp_tpu.testing import make_args, tiny_bert_config


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("apps"))
    model_dir = make_pretrained(os.path.join(base, "tiny-bert"))
    tok = BertTokenizer.from_pretrained(model_dir)
    make_args()
    return base, model_dir, tok


def test_two_tower_dataset_and_model(tiny):
    base, model_dir, tok = tiny
    path = make_tsv(os.path.join(base, "match.tsv"), 16)
    from easynlp_tpu.appzoo.text_match.data import TwoTowerDataset
    ds = TwoTowerDataset(path, tok, max_seq_length=16,
                         input_schema="id:str:1,sent:str:1,label:str:1",
                         first_sequence="sent", second_sequence="sent",
                         label_name="label")
    assert "input_ids_b" in ds.features
    from easynlp_tpu.appzoo.text_match.model import TextMatchTwoTower
    app = TextMatchTwoTower.from_pretrained(model_dir)
    batch = ds.batch_fn([ds[i] for i in range(4)])
    out = app.forward(batch)
    assert out["embeddings"].shape == (4, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["embeddings"]), axis=-1), 1.0, atol=1e-3)
    loss = TextMatchTwoTower.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_sequence_labeling_alignment(tiny):
    base, model_dir, tok = tiny
    path = os.path.join(base, "ner.tsv")
    with open(path, "w") as f:
        f.write("good day\tB-X O\n")
        f.write("bad bad thing\tB-Y I-Y O\n")
    from easynlp_tpu.appzoo.sequence_labeling.data import SequenceLabelingDataset
    ds = SequenceLabelingDataset(path, tok, max_seq_length=16,
                                 input_schema="sent:str:1,ner:str:1",
                                 first_sequence="sent", label_name="ner")
    ex = ds[0]
    # CLS ignored, 'good'→B-X, 'day'→O, SEP/pad ignored
    lm = ds.label_mapping
    assert ex["label_ids"][0] == -100
    assert ex["label_ids"][1] == lm["B-X"]
    assert ex["label_ids"][2] == lm["O"]
    assert all(l == -100 for l in ex["label_ids"][3:])

    from easynlp_tpu.appzoo.sequence_labeling.evaluator import bio_spans
    spans = bio_spans(["B-ORG", "I-ORG", "O", "B-PER"])
    assert spans == {("ORG", 0, 2), ("PER", 3, 4)}


def test_mlm_dataset_masking(tiny):
    base, model_dir, tok = tiny
    path = make_tsv(os.path.join(base, "lm.tsv"), 32)
    from easynlp_tpu.appzoo.language_modeling.data import LanguageModelingDataset
    ds = LanguageModelingDataset(path, tok, max_seq_length=16,
                                 input_schema="id:str:1,sent:str:1,label:str:1",
                                 first_sequence="sent")
    ex = ds[0]
    ids, labels = ex["input_ids"], ex["label_ids"]
    # labels set exactly where input differs from base or kept-but-selected
    sel = labels != -100
    # special tokens never selected
    specials = np.isin(ds.base["input_ids"][0], tok.all_special_ids)
    assert not (sel & specials).any()
    # masked positions have the original token as label
    assert (labels[sel] == ds.base["input_ids"][0][sel]).all()
    # different epochs → different masks (dynamic masking); with short rows a
    # single row may coincide, so check across the whole table
    epoch0 = [ds[i]["label_ids"].tobytes() for i in range(len(ds))]
    ds.set_epoch(1)
    epoch1 = [ds[i]["label_ids"].tobytes() for i in range(len(ds))]
    assert epoch0 != epoch1


def test_mlm_forward_and_loss(tiny):
    base, model_dir, tok = tiny
    from easynlp_tpu.appzoo.language_modeling.model import LanguageModeling
    app = LanguageModeling.from_pretrained(model_dir)
    b, s = 2, 16
    batch = {
        "input_ids": np.full((b, s), 5, np.int32),
        "attention_mask": np.ones((b, s), np.int32),
        "token_type_ids": np.zeros((b, s), np.int32),
        "label_ids": np.full((b, s), -100, np.int32),
    }
    batch["label_ids"][:, 3] = 7
    out = app.forward(batch)
    assert out["logits"].shape[-1] == app.config.vocab_size
    loss = LanguageModeling.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_ckbert_contrastive_mlm(tiny):
    base, model_dir, tok = tiny
    from easynlp_tpu.appzoo.language_modeling.model import CKBertLanguageModeling
    app = CKBertLanguageModeling.from_pretrained(model_dir)
    b, s = 4, 12
    batch = {"input_ids": np.full((b, s), 5, np.int32),
             "attention_mask": np.ones((b, s), np.int32),
             "token_type_ids": np.zeros((b, s), np.int32),
             "label_ids": np.full((b, s), -100, np.int32)}
    batch["label_ids"][:, 2] = 6
    # training view (two dropout passes) via module.apply with rngs
    import jax as _jax
    out = app.module.apply(
        {"params": app.params}, input_ids=jnp.asarray(batch["input_ids"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        deterministic=False, rngs={"dropout": _jax.random.PRNGKey(0)})
    assert "cls_view2" in out
    ld = CKBertLanguageModeling.loss_fn(out, batch)
    assert "contrastive_loss" in ld and np.isfinite(float(ld["loss"]))
    # the two views differ (independent dropout)
    assert not np.allclose(np.asarray(out["cls_view1"]),
                           np.asarray(out["cls_view2"]))
