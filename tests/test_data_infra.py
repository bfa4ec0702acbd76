"""Data-infrastructure parity: lazy/streaming rows (reference
mg_utils/lazy_loader.py), ODPS table-reader seam (reference
appzoo/dataset.py:68-134), pipelines task parity (reference
pipelines/__init__.py:39-110)."""

import numpy as np
import pytest


@pytest.fixture()
def corpus(tmp_path):
    path = str(tmp_path / "corpus.tsv")
    with open(path, "w") as f:
        for i in range(50):
            f.write("%d\tthe good day number %d\n" % (i, i))
            if i % 10 == 0:
                f.write("\n")  # blank lines must be skipped
    return path


def test_lazy_rows_matches_eager(corpus):
    from easynlp_tpu.data.lazy_loader import LazyRows
    rows = LazyRows(corpus)
    with open(corpus) as f:
        eager = [ln.rstrip("\n") for ln in f if ln.strip()]
    assert len(rows) == len(eager) == 50
    assert rows[0] == eager[0]
    assert rows[49] == eager[49]
    assert list(rows[10:15]) == eager[10:15]
    # multi-host style slicing on a slice view
    view = rows[1::4]
    assert list(view) == eager[1::4]
    rows.close()


def test_streaming_mlm_dataset(corpus, tmp_path):
    from easynlp_tpu.data.lazy_loader import StreamingLanguageModelingDataset
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    vocab = str(tmp_path / "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "the", "good", "day", "number"]
                          + [str(i) for i in range(10)]))
    tok = BertTokenizer(vocab)
    ds = StreamingLanguageModelingDataset(
        corpus, tok, max_seq_length=12,
        input_schema="id:str:1,text:str:1", first_sequence="text",
        mask_probability=0.5, seed=7)
    assert len(ds) == 50
    ex = ds[3]
    assert ex["input_ids"].shape == (12,)
    assert (ex["label_ids"] != -100).sum() > 0
    # deterministic per (epoch, idx); changes across epochs
    again = ds[3]
    np.testing.assert_array_equal(ex["input_ids"], again["input_ids"])
    ds.set_epoch(1)
    other = ds[3]
    assert not np.array_equal(ex["input_ids"], other["input_ids"]) or \
        not np.array_equal(ex["label_ids"], other["label_ids"])


def test_odps_local_emulation(corpus, tmp_path):
    from easynlp_tpu.appzoo.sequence_classification.data import (
        ClassificationDataset)
    from easynlp_tpu.data.odps_reader import (ODPSTableReader,
                                              register_local_table)
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer

    # table reader interface
    register_local_table("mytable", corpus)
    reader = ODPSTableReader("odps://local/mytable")
    assert reader.get_row_count() == 50
    first = reader.read(2)
    assert first[0][0] == "0"
    reader.seek(10)
    assert reader.read(1)[0][0] == "10"

    # slice per process
    r0 = ODPSTableReader("odps://local/mytable", slice_id=0, slice_count=2)
    r1 = ODPSTableReader("odps://local/mytable", slice_id=1, slice_count=2)
    assert r0.get_row_count() + r1.get_row_count() == 50

    # end-to-end through a dataset: odps:// paths route to the reader
    tsv = str(tmp_path / "cls.tsv")
    with open(tsv, "w") as f:
        for i in range(8):
            f.write("%d\tgood day\t%s\n" % (i, "pos" if i % 2 else "neg"))
    register_local_table("cls", tsv)
    vocab = str(tmp_path / "v.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "good", "day", "pos", "neg"]))
    ds = ClassificationDataset(
        "odps://local/cls", BertTokenizer(vocab), max_seq_length=8,
        input_schema="id:str:1,sent:str:1,label:str:1",
        first_sequence="sent", label_name="label")
    assert len(ds) == 8
    assert ds.label_enumerate_values == ["neg", "pos"]


def test_pipeline_task_parity():
    """All 14 reference pipeline tasks are registered (reference
    pipelines/__init__.py:39-110)."""
    from easynlp_tpu.pipelines import SUPPORTED_TASKS
    for task in ("text_classify", "text_match", "sequence_labeling",
                 "text2image_generation", "image2text_generation",
                 "machine_reading_comprehension", "chinese-ldm-general",
                 "chinese-ldm-fashion", "chinese-ldm-art",
                 "chinese-ldm-poem", "chinese-ldm-anime", "chinese-ldm-pet",
                 "chinese-ldm-food", "stable-diffusion-general"):
        assert task in SUPPORTED_TASKS, task


def test_regression_and_report_metrics():
    """pearson/spearman for regression heads + precision/recall opt-in
    (reference sequence_classification/evaluator.py:123-134)."""
    from easynlp_tpu.appzoo.sequence_classification.evaluator import (
        SequenceClassificationEvaluator)

    ev = SequenceClassificationEvaluator.__new__(
        SequenceClassificationEvaluator)
    ev.multi_label = False
    ev.eval_metrics = ["pearson_and_spearman"]
    rng = np.random.RandomState(0)
    labels = rng.rand(50).astype(np.float32)
    logits = (labels + 0.05 * rng.randn(50)).astype(np.float32)[:, None]
    results = dict(ev._single_label_metrics(logits, labels))
    assert results["pearson"] > 0.9
    assert results["spearman"] > 0.9
    assert abs(results["pearson_and_spearman"]
               - (results["pearson"] + results["spearman"]) / 2) < 1e-9

    ev.eval_metrics = ["precision_recall"]
    labels2 = rng.randint(0, 2, 40)
    logits2 = rng.randn(40, 2).astype(np.float32)
    results2 = dict(ev._single_label_metrics(logits2, labels2))
    assert "precision" in results2 and "recall" in results2


def test_tf_checkpoint_roundtrip(tmp_path):
    """export_tf_checkpoint → load_bert_tf_checkpoint roundtrips the BERT
    backbone exactly (reference utils/adapter.py:25-166 + exporter.py:81-193
    TF bridge).

    Runs in a SUBPROCESS: importing tensorflow into the pytest process
    alongside jaxlib+torch clashes at the LLVM/absl layer and has caused
    sporadic SIGSEGV in later XLA:CPU compiles (two mid-suite segfaults traced
    to this import). The bridge itself is library code with a lazy
    function-level TF import, so only this test needs isolation."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import sys
        import jax, numpy as np
        import jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")

        from easynlp_tpu.modelzoo.models.bert import BertModel
        from easynlp_tpu.testing import tiny_bert_config
        from easynlp_tpu.utils.adapter import load_bert_tf_checkpoint
        from easynlp_tpu.utils.exporter import export_tf_checkpoint

        cfg = tiny_bert_config(vocab_size=50)
        m = BertModel(config=cfg, dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        variables = m.init({"params": rng, "dropout": rng},
                           jnp.ones((1, 8), jnp.int32), deterministic=True)
        from flax import linen as nn
        params = nn.unbox(variables["params"])

        ckpt = sys.argv[1] + "/tfckpt/bert_model.ckpt"
        export_tf_checkpoint(params, cfg, ckpt)
        restored = load_bert_tf_checkpoint(ckpt, cfg)

        import jax.tree_util as jtu
        flat_ref = jtu.tree_leaves_with_path(jax.tree.map(np.asarray, params))
        ref_map = {jtu.keystr(p): v for p, v in flat_ref}
        for path, val in jtu.tree_leaves_with_path(restored):
            key = jtu.keystr(path)
            assert key in ref_map, key
            np.testing.assert_allclose(val, ref_map[key], atol=1e-6,
                                       err_msg=key)
        assert len(jax.tree.leaves(restored)) == len(flat_ref)
        print("ROUNDTRIP_OK")
    """)
    out = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                         capture_output=True, text=True, timeout=600,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROUNDTRIP_OK" in out.stdout


def test_dkplm_pretrain_dataset(tmp_path):
    """DKPLM knowledge branch: [ENT] span parsing, TransE pseudo-entity
    injection, decode-knowledge labels (reference
    appzoo/language_modeling/data.py:526-601)."""
    import jax.numpy as jnp

    from easynlp_tpu.appzoo.language_modeling.dkplm_data import (
        DKPLMPretrainDataset)
    from easynlp_tpu.appzoo.language_modeling.model import (
        DKPLMLanguageModeling)
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    from easynlp_tpu.testing import make_args

    vocab = str(tmp_path / "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "the", "city", "paris", "is", "big"]))
    ent_path = str(tmp_path / "ent.txt")
    with open(ent_path, "w") as f:
        f.write("\n".join(",".join(str(float(i + j)) for j in range(8))
                          for i in range(4)))
    rel_path = str(tmp_path / "rel.txt")
    with open(rel_path, "w") as f:
        f.write("\n".join(",".join(str(0.5) for _ in range(8))
                          for _ in range(3)))
    data = str(tmp_path / "rows.txt")
    with open(data, "w") as f:
        for i in range(4):
            f.write(repr({"text": "the [ENT] paris [ENT] is big",
                          "relation_id": 1,
                          "replced_entity_id": 2}) + "\n")

    ds = DKPLMPretrainDataset(
        data, BertTokenizer(vocab), max_seq_length=12,
        user_defined_parameters={"entity_emb_file": ent_path,
                                 "rel_emb_file": rel_path})
    ex = ds[0]
    assert ex["insert_know_emb"].shape == (12, 8)
    span = np.where(ex["insert_know_position_mask"] == 1)[0]
    assert len(span) == 1 and span[0] == 2   # 'paris' after [CLS] 'the'
    np.testing.assert_allclose(ex["insert_know_emb"][span[0]],
                               np.arange(2.0, 10.0) + 0.5)   # ent2 + rel1
    assert ex["insert_know_labels"][span[0]] == ex["input_ids"][span[0]]
    # MLM never masks inside the knowledge span
    assert ex["label_ids"][span[0]] == -100

    # forward + loss through the app
    make_args()
    from easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm import DKPLMConfig
    cfg = DKPLMConfig(vocab_size=10, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=16, knowledge_emb_size=8)
    module = DKPLMLanguageModeling.build_module(cfg, dtype=jnp.float32)
    params = DKPLMLanguageModeling.init_params(module, cfg)
    app = DKPLMLanguageModeling(module, params, cfg)
    from easynlp_tpu.data.dataset import DataLoader
    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False)))
    batch.pop("_valid", None)
    out = app.forward(batch)
    loss = DKPLMLanguageModeling.loss_fn(out, batch)
    assert np.isfinite(float(loss["loss"]))
    assert "decode_know_loss" in loss


def test_megatron_glm_tp_slice_merge(tmp_path):
    """Megatron mp_rank slices merge back to the full weights (column/row/
    vocab-parallel + the per-rank q|k|v stacking) and convert onto the
    scanned GLM layout (reference mg_utils checkpoint format)."""
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.modelzoo.models.glm.conversion import (
        convert_glm, merge_megatron_tp_slices)
    from easynlp_tpu.modelzoo.models.glm.modeling_glm import (GLMConfig,
                                                              GLMModel)

    rng = np.random.RandomState(0)
    H, L, V, S = 16, 2, 30, 12
    cfg = GLMConfig(vocab_size=V, hidden_size=H, num_layers=L,
                    num_attention_heads=2, max_sequence_length=S)

    full = {}
    full["word_embeddings.weight"] = rng.randn(V, H).astype(np.float32)
    full["transformer.position_embeddings.weight"] = rng.randn(
        S + 1, H).astype(np.float32)
    full["transformer.block_position_embeddings.weight"] = rng.randn(
        S + 1, H).astype(np.float32)
    for nm in ("transformer.final_layernorm",):
        full[nm + ".weight"] = np.ones(H, np.float32)
        full[nm + ".bias"] = np.zeros(H, np.float32)
    for i in range(L):
        b = "transformer.layers.%d." % i
        for nm in ("input_layernorm", "post_attention_layernorm"):
            full[b + nm + ".weight"] = np.ones(H, np.float32)
            full[b + nm + ".bias"] = np.zeros(H, np.float32)
        full[b + "attention.query_key_value.weight"] = rng.randn(
            3 * H, H).astype(np.float32)
        full[b + "attention.query_key_value.bias"] = rng.randn(
            3 * H).astype(np.float32)
        full[b + "attention.dense.weight"] = rng.randn(H, H).astype(
            np.float32)
        full[b + "attention.dense.bias"] = rng.randn(H).astype(np.float32)
        full[b + "mlp.dense_h_to_4h.weight"] = rng.randn(4 * H, H).astype(
            np.float32)
        full[b + "mlp.dense_h_to_4h.bias"] = rng.randn(4 * H).astype(
            np.float32)
        full[b + "mlp.dense_4h_to_h.weight"] = rng.randn(H, 4 * H).astype(
            np.float32)
        full[b + "mlp.dense_4h_to_h.bias"] = rng.randn(H).astype(np.float32)

    # slice into 2 TP ranks per Megatron rules
    def make_slice(r, tp=2):
        out = {}
        for k, v in full.items():
            if "query_key_value" in k:
                q, kk, vv = np.split(v, 3, axis=0)
                out[k] = np.concatenate(
                    [np.split(q, tp, 0)[r], np.split(kk, tp, 0)[r],
                     np.split(vv, tp, 0)[r]], axis=0)
            elif "word_embeddings" in k or "dense_h_to_4h" in k:
                out[k] = np.split(v, tp, axis=0)[r]
            elif ("attention.dense.weight" in k
                  or "dense_4h_to_h.weight" in k):
                out[k] = np.split(v, tp, axis=1)[r]
            else:
                out[k] = v
        return out

    merged = merge_megatron_tp_slices([make_slice(0), make_slice(1)])
    for k in full:
        np.testing.assert_array_equal(merged[k], full[k], err_msg=k)

    params = convert_glm(merged, cfg)
    module = GLMModel(config=cfg, dtype=jnp.float32)
    ref = module.init({"params": jax.random.PRNGKey(0), "dropout":
                       jax.random.PRNGKey(0)},
                      jnp.ones((1, 8), jnp.int32), deterministic=True)
    from flax import linen as nn
    ref = nn.unbox(ref["params"])

    def shapes(tree, p=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(shapes(v, p + k + "/"))
            else:
                out[p + k] = np.asarray(v).shape
        return out

    ref_s = shapes(jax.tree.map(np.asarray, ref))
    for path, shp in shapes(params).items():
        assert path in ref_s and ref_s[path] == shp, (path, shp)
    out = module.apply({"params": params}, jnp.ones((2, 8), jnp.int32),
                       deterministic=True)
    assert np.isfinite(np.asarray(out["last_hidden_state"])).all()


def test_oss_scheme_through_local_dir_io(tmp_path):
    """The oss:// scheme works end-to-end through the io.register seam with
    the directory-backed emulation (reference OSSIO surface :279-635):
    datasets read from it and checkpoints write to it."""
    import jax.numpy as jnp

    from easynlp_tpu.appzoo.sequence_classification.data import (
        ClassificationDataset)
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    from easynlp_tpu.utils.io_utils import io
    from easynlp_tpu.utils.oss_io import LocalDirIO

    root = str(tmp_path / "bucket")
    backend = LocalDirIO("oss://test-bucket/", root)
    io.register("oss://test-bucket/", backend)
    try:
        with io.open("oss://test-bucket/data/train.tsv", "w") as f:
            for i in range(8):
                f.write("%d\tgood day\t%s\n" % (i, "pos" if i % 2
                                                else "neg"))
        assert io.exists("oss://test-bucket/data/train.tsv")
        assert io.listdir("oss://test-bucket/data") == ["train.tsv"]

        vocab = str(tmp_path / "v.txt")
        with open(vocab, "w") as f:
            f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]",
                               "[MASK]", "good", "day", "pos", "neg"]))
        ds = ClassificationDataset(
            "oss://test-bucket/data/train.tsv", BertTokenizer(vocab),
            max_seq_length=8,
            input_schema="id:str:1,sent:str:1,label:str:1",
            first_sequence="sent", label_name="label")
        assert len(ds) == 8

        # checkpoint-style write through the scheme
        with io.open("oss://test-bucket/ckpt/meta.json", "w") as f:
            f.write('{"global_step": 3}')
        with io.open("oss://test-bucket/ckpt/meta.json") as f:
            assert "global_step" in f.read()
        io.copy("oss://test-bucket/ckpt/meta.json", str(tmp_path / "m.json"))
        assert (tmp_path / "m.json").exists()
    finally:
        io.backends.pop("oss://test-bucket/", None)


def test_remote_model_path_resolution(tmp_path, monkeypatch):
    """oss:// model dirs materialise through the io seam into the local
    cache (reference utils/__init__.py:101-202)."""
    import json

    from easynlp_tpu.utils import get_pretrain_model_path
    from easynlp_tpu.utils.io_utils import io
    from easynlp_tpu.utils.oss_io import LocalDirIO

    monkeypatch.setenv("HOME", str(tmp_path))
    root = str(tmp_path / "bucket")
    io.register("oss://models/", LocalDirIO("oss://models/", root))
    try:
        with io.open("oss://models/tiny-bert/config.json", "w") as f:
            json.dump({"model_type": "bert", "vocab_size": 10}, f)
        with io.open("oss://models/tiny-bert/vocab.txt", "w") as f:
            f.write("[PAD]\n[UNK]\n")
        local = get_pretrain_model_path("oss://models/tiny-bert")
        import os
        assert os.path.isfile(os.path.join(local, "config.json"))
        assert os.path.isfile(os.path.join(local, "vocab.txt"))
        # second resolution hits the cache (no error if backend vanished)
        assert get_pretrain_model_path("oss://models/tiny-bert") == local
    finally:
        io.backends.pop("oss://models/", None)


def test_general_dataset_feature_inference(tmp_path):
    """GeneralDataset auto-infers sequences + ClassLabel list and
    featurises to shape-static examples (reference appzoo/dataset.py
    :318-351, :372-388)."""
    import datasets as hf_datasets
    import numpy as np

    from easynlp_tpu.data.dataset import GeneralDataset
    from easynlp_tpu.modelzoo.models.bert.tokenization_bert import (
        BertTokenizer)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list("abcdef")
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = BertTokenizer(str(vp))

    table = hf_datasets.Dataset.from_dict(
        {"text": ["a b", "c d", "e f", "a c"],
         "label": [0, 1, 1, 0]},
        features=hf_datasets.Features(
            {"text": hf_datasets.Value("string"),
             "label": hf_datasets.ClassLabel(names=["neg", "pos"])}))
    ds = GeneralDataset(table, tokenizer=tok, max_seq_length=8)
    assert ds.label_enumerate_values == ["neg", "pos"]
    assert ds.first_sequence == "text" and ds.second_sequence is None
    ex = ds[1]
    assert ex["input_ids"].shape == (8,)
    assert int(ex["label_ids"]) == 1
    batch = ds.batch_fn([ds[i] for i in range(4)])
    assert batch["input_ids"].shape == (4, 8)
    assert batch["label_ids"].tolist() == [0, 1, 1, 0]

    # ner_tags branch
    table2 = hf_datasets.Dataset.from_dict(
        {"id": ["0"], "tokens": [["a", "b"]], "ner_tags": [[0, 1]]},
        features=hf_datasets.Features(
            {"id": hf_datasets.Value("string"),
             "tokens": hf_datasets.Sequence(hf_datasets.Value("string")),
             "ner_tags": hf_datasets.Sequence(
                 hf_datasets.ClassLabel(names=["O", "B-X"]))}))
    ds2 = GeneralDataset(table2)
    assert ds2.label_name == "ner_tags"
    assert ds2.label_enumerate_values == ["O", "B-X"]


def test_general_dataset_label_first_column(tmp_path):
    """A dataset whose label column comes first (HF yelp_review_full layout
    [label, text]) must still tokenize the text column, not the label
    (advisor round-2 finding)."""
    import datasets as hf_datasets

    from easynlp_tpu.data.dataset import GeneralDataset
    from easynlp_tpu.modelzoo.models.bert.tokenization_bert import (
        BertTokenizer)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list("abcdef")
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = BertTokenizer(str(vp))

    table = hf_datasets.Dataset.from_dict(
        {"label": [1, 0], "text": ["a b", "c d"]},
        features=hf_datasets.Features(
            {"label": hf_datasets.ClassLabel(names=["neg", "pos"]),
             "text": hf_datasets.Value("string")}))
    ds = GeneralDataset(table, tokenizer=tok, max_seq_length=8)
    assert ds.first_sequence == "text"
    assert ds.second_sequence is None
    ex = ds[0]
    # [CLS] a b [SEP] → ids for 'a'(5) and 'b'(6) present, label not in text
    ids = ex["input_ids"].tolist()
    assert vocab.index("a") in ids and vocab.index("b") in ids
    assert int(ex["label_ids"]) == 1


def test_dataloader_parallel_featurisation_matches_sync():
    """num_workers>1 must yield byte-identical batches in the same order as
    the synchronous path (thread pool preserves index order via map)."""
    import numpy as np

    from easynlp_tpu.data.dataset import DataLoader

    class SlowDataset:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            # simulate per-item image decode work
            rng = np.random.RandomState(i)
            return {"x": rng.rand(4).astype(np.float32),
                    "i": np.int32(i)}

        def batch_fn(self, ex):
            return {k: np.stack([e[k] for e in ex]) for k in ex[0]}

    sync = list(DataLoader(SlowDataset(), 8, shuffle=True, seed=3))
    par = list(DataLoader(SlowDataset(), 8, shuffle=True, seed=3,
                          num_workers=4))
    assert len(sync) == len(par)
    for a, b in zip(sync, par):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
