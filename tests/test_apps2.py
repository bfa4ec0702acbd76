import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
from make_fixtures import make_pretrained  # noqa: E402

from easynlp_tpu.modelzoo.models.bert import BertTokenizer
from easynlp_tpu.testing import make_args


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("apps2"))
    model_dir = make_pretrained(os.path.join(base, "tiny-bert"))
    tok = BertTokenizer.from_pretrained(model_dir)
    make_args()
    return base, model_dir, tok


def test_mrc_dataset_and_model(tiny):
    base, model_dir, tok = tiny
    path = os.path.join(base, "mrc.tsv")
    with open(path, "w") as f:
        f.write("q1\twas it a good day\tthe day was good and nice\tgood\n")
        f.write("q2\twhat was bad\tthe story was bad\tbad\n")
    from easynlp_tpu.appzoo.machine_reading_comprehension.data import MRCDataset
    ds = MRCDataset(path, tok, max_seq_length=32,
                    input_schema="qid:str:1,question:str:1,context:str:1,answer:str:1",
                    first_sequence="question", second_sequence="context",
                    label_name="answer")
    ex = ds[0]
    s, e = int(ex["start_positions"]), int(ex["end_positions"])
    assert s > 0 and e >= s
    answer_ids = ex["input_ids"][s:e + 1]
    assert tok.decode(answer_ids) == "good"

    from easynlp_tpu.appzoo.machine_reading_comprehension.model import (
        MachineReadingComprehension)
    app = MachineReadingComprehension.from_pretrained(model_dir)
    batch = ds.batch_fn([ds[0], ds[1]])
    out = app.forward(batch)
    assert out["start_logits"].shape == (2, 32)
    loss = MachineReadingComprehension.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_information_extraction(tiny):
    base, model_dir, tok = tiny
    path = os.path.join(base, "ie.tsv")
    with open(path, "w") as f:
        f.write("good day it was\t0,3,POS\n")
        f.write("bad bad thing\t0,2,NEG;4,6,NEG\n")
    from easynlp_tpu.appzoo.information_extraction.data import (
        InformationExtractionDataset)
    ds = InformationExtractionDataset(
        path, tok, max_seq_length=24,
        input_schema="content:str:1,entities:str:1",
        first_sequence="content", label_name="entities")
    assert ds.label_enumerate_values == ["NEG", "POS"]
    ex = ds[0]
    assert ex["span_labels"][ds.label_mapping["POS"], 1, 4] == 1

    from easynlp_tpu.appzoo.information_extraction.model import (
        InformationExtractionModel)
    app = InformationExtractionModel.from_pretrained(
        model_dir, num_entity_types=2)
    batch = ds.batch_fn([ds[0], ds[1]])
    out = app.forward(batch)
    assert out["span_scores"].shape == (2, 2, 24, 24)
    loss = InformationExtractionModel.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_geep_forward_and_loss(tiny):
    base, model_dir, tok = tiny
    from easynlp_tpu.appzoo.geep_classification.model import GEEPClassification
    app = GEEPClassification.from_pretrained(model_dir, num_labels=3)
    b, s = 2, 12
    batch = {"input_ids": np.full((b, s), 5, np.int32),
             "attention_mask": np.ones((b, s), np.int32),
             "token_type_ids": np.zeros((b, s), np.int32),
             "label_ids": np.array([0, 2], np.int32)}
    out = app.forward(batch)
    assert out["exit_logits"].shape[0] == app.config.num_hidden_layers
    assert out["logits"].shape == (b, 3)
    assert (np.asarray(out["exit_layer"]) < app.config.num_hidden_layers).all()
    loss = GEEPClassification.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_fewshot_pet(tiny):
    base, model_dir, tok = tiny
    path = os.path.join(base, "fs.tsv")
    with open(path, "w") as f:
        f.write("it was a good day\tgood\n")
        f.write("a bad bad story\tbad\n")
    from easynlp_tpu.fewshot_learning import (FewshotClassification,
                                              FewshotDataset)
    ds = FewshotDataset(path, tok, max_seq_length=24,
                        input_schema="sent:str:1,label:str:1",
                        first_sequence="sent", label_name="label",
                        pattern="{sent1} it was {mask}",
                        label_desc="bad,good")
    ex = ds[0]
    assert ex["input_ids"][ex["mask_positions"]] == tok.mask_token_id
    app = FewshotClassification.from_pretrained(model_dir)
    batch = ds.batch_fn([ds[0], ds[1]])
    out = app.forward(batch)
    assert out["logits"].shape == (2, 2)
    loss = FewshotClassification.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))

    from easynlp_tpu.fewshot_learning import CPTClassification
    loss2 = CPTClassification.loss_fn(out, batch)
    assert np.isfinite(float(loss2["loss"]))


def test_distillation_loss(tiny):
    base, model_dir, tok = tiny
    from easynlp_tpu.distillation import DistillatorySequenceClassification
    logits = jnp.array([[2.0, -1.0], [0.5, 0.5]])
    batch = {"teacher_logits": jnp.array([[3.0, -2.0], [1.0, 0.0]]),
             "label_ids": jnp.array([0, 1])}
    loss = DistillatorySequenceClassification.loss_fn(
        {"logits": logits}, batch)["loss"]
    assert np.isfinite(float(loss))


def test_auto_classes(tiny):
    base, model_dir, tok = tiny
    from easynlp_tpu.modelzoo.models.auto import (AutoConfig, AutoModel,
                                                  AutoTokenizer)
    cfg = AutoConfig.from_pretrained(model_dir)
    assert cfg.model_type == "bert"
    t = AutoTokenizer.from_pretrained(model_dir)
    assert t.vocab_size == cfg.vocab_size
    module, params = AutoModel.from_pretrained(model_dir)
    assert params is None  # fixture has no weights
    assert module.config.hidden_size == cfg.hidden_size
