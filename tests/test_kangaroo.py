"""Kangaroo: entity trie, pretraining dataset (entity linking + entity-aware
masking + contrastive sample tables), dual-stream model, and the MLM+contrast
loss (reference easynlp/modelzoo/models/kangaroo/ +
appzoo/language_modeling/data.py kangaroo branch)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_token_trie_longest_match():
    from easynlp_tpu.data.entity_trie import TokenTrie
    t = TokenTrie()
    t.add_word([5, 6])
    t.add_word([5, 6, 7])
    t.add_word([9])
    assert t.search([5, 6, 7, 8], 0) == [2, 3]   # both matches, longest last
    assert t.search([5, 7], 0) == []
    assert t.search([1, 9], 1) == [2]


@pytest.fixture(scope="module")
def kangaroo_fixtures(tmp_path_factory):
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    base = tmp_path_factory.mktemp("kang")
    # char-level vocab (Chinese-style single-char tokens)
    chars = list("abcdefghij")
    vocab = str(base / "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + chars))
    tok = BertTokenizer(vocab)

    # entity CSV: "ab" (id 0) and "fg" (id 1)
    csv_path = str(base / "entities.csv")
    with open(csv_path, "w") as f:
        f.write("index,main_name,name_list\n0,ab,ab\n1,fg,fg|fgh\n")

    # contrastive samples: 4 levels of char token sequences per entity
    samples = {
        0: {"level_%d" % i: [{"tokens": list("abc"),
                              "position_id": [0, 1, 2]}]
            for i in range(1, 5)},
        1: {"level_%d" % i: [{"tokens": list("fgh"),
                              "position_id": [0, 1, 2]}]
            for i in range(1, 5)},
    }
    samples_path = str(base / "samples.npy")
    np.save(samples_path, samples, allow_pickle=True)

    concept = {0: np.ones(8, np.float32).tolist(),
               1: (2 * np.ones(8, np.float32)).tolist()}
    concept_path = str(base / "concept.npy")
    np.save(concept_path, concept, allow_pickle=True)

    data_path = str(base / "train.tsv")
    rows = ["%d\tabcdefgh" % i for i in range(8)]
    with open(data_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return {"tok": tok, "csv": csv_path, "samples": samples_path,
            "concept": concept_path, "data": data_path}


def _make_ds(fx, **extra):
    from easynlp_tpu.appzoo.language_modeling.kangaroo_data import (
        KangarooPretrainDataset)
    udp = {"entity_file": fx["csv"], "samples_file": fx["samples"],
           "concept_emb_file": fx["concept"], "ent_num": 2, "sample_num": 4,
           "concept_size": 8, "entity_gap": 1}
    udp.update(extra)
    return KangarooPretrainDataset(
        fx["data"], fx["tok"], max_seq_length=16,
        input_schema="id:str:1,text:str:1", first_sequence="text",
        user_defined_parameters=udp)


def test_kangaroo_dataset_features(kangaroo_fixtures):
    ds = _make_ds(kangaroo_fixtures)
    ex = ds[0]
    assert ex["input_ids"].shape == (16,)
    assert ex["sample_token_id"].shape == (2, 4, 16)
    assert ex["concept_emb"].shape == (2, 8)
    # "ab" at positions 1-2 (after CLS), "fg" linked later
    ep = ex["entities_position"]
    assert ep[1] == 1 and ep[2] == 1
    assert (ep == 2).sum() >= 1                  # fg (or fgh) linked
    # MLM labels exist (entity masking itself is capped at 10% of tokens —
    # reference kangaroo_create_mask drops entities on short rows)
    masked_pos = np.where(ex["label_ids"] != -100)[0]
    assert len(masked_pos) > 0
    assert (ex["ent_mask"] == (ep != 0).astype(np.int32)).all()
    # concept embedding rows picked per linked entity id
    assert np.allclose(ex["concept_emb"][0], 1.0)


def test_kangaroo_model_and_loss(kangaroo_fixtures):
    from easynlp_tpu.appzoo.language_modeling.model import (
        KangarooLanguageModeling)
    from easynlp_tpu.modelzoo.models.kangaroo import KangarooConfig
    from easynlp_tpu.data.dataset import DataLoader
    from easynlp_tpu.testing import make_args

    make_args()
    cfg = KangarooConfig(
        vocab_size=15, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, ent_size=16, ent_heads=4,
        concept_size=8, ent_num=2, sample_num=4,
        layer_types=["sim", "norm", "mix"])
    module = KangarooLanguageModeling.build_module(cfg, dtype=jnp.float32)
    params = KangarooLanguageModeling.init_params(module, cfg)
    app = KangarooLanguageModeling(module, params, cfg)

    ds = _make_ds(kangaroo_fixtures)
    batch = DataLoader(ds, batch_size=4, shuffle=False).__iter__().__next__()
    batch.pop("_valid", None)
    out = app.forward(batch)
    assert out["logits"].shape == (4, 16, 15)
    assert out["cos_score"].shape == (4, 16, 4)
    # sample_label: 0 at entity tokens, -100 elsewhere
    lbl = np.asarray(out["sample_label"])
    assert set(np.unique(lbl)).issubset({0, -100})
    assert (lbl == 0).sum() > 0
    loss = KangarooLanguageModeling.loss_fn(out, batch)
    assert np.isfinite(float(loss["loss"]))
    assert "contrast_loss" in loss

    # gradients flow through both streams and the contrast head
    def scalar_loss(p):
        o = module.apply({"params": p}, **{
            k: batch[k] for k in app.model_input_keys if k in batch},
            deterministic=True)
        return KangarooLanguageModeling.loss_fn(o, batch)["loss"]

    g = jax.grad(scalar_loss)(app.params)
    ent_g = g["kangaroo"]["layer_1"]["attention_ent"]["qkv"]["kernel"]
    assert float(jnp.abs(ent_g).max()) > 0
    tok_g = g["token_emb"]["kernel"]
    assert float(jnp.abs(tok_g).max()) > 0


def test_kangaroo_ckpt_conversion():
    """convert_kangaroo maps a reference-named state dict onto the module
    layout: every converted leaf matches the init-param shape and the fused
    qkv equals q|k|v concatenation."""
    from easynlp_tpu.appzoo.language_modeling.model import (
        KangarooLanguageModeling)
    from easynlp_tpu.modelzoo.models.kangaroo import KangarooConfig
    from easynlp_tpu.modelzoo.models.kangaroo.modeling_kangaroo import (
        convert_kangaroo)

    cfg = KangarooConfig(
        vocab_size=15, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, ent_size=16, ent_heads=4,
        concept_size=8, ent_num=2, sample_num=4,
        layer_types=["sim", "norm"])
    module = KangarooLanguageModeling.build_module(cfg, dtype=jnp.float32)
    ref = KangarooLanguageModeling.init_params(module, cfg)

    rng = np.random.RandomState(0)
    s = {}

    def dense(key, din, dout):
        s[key + ".weight"] = rng.randn(dout, din).astype(np.float32)
        s[key + ".bias"] = rng.randn(dout).astype(np.float32)

    def ln(key, d):
        s[key + ".weight"] = np.ones(d, np.float32)
        s[key + ".bias"] = np.zeros(d, np.float32)

    H, E, I = 32, 16, 64
    s["kangaroo.embeddings.word_embeddings.weight"] = \
        rng.randn(15, H).astype(np.float32)
    s["kangaroo.embeddings.position_embeddings.weight"] = \
        rng.randn(32, H).astype(np.float32)
    s["kangaroo.embeddings.token_type_embeddings.weight"] = \
        rng.randn(2, H).astype(np.float32)
    ln("kangaroo.embeddings.LayerNorm", H)
    for i, t in enumerate(cfg.layer_types):
        base = "kangaroo.encoder.layer.%d." % i
        for n in ("query", "key", "value"):
            dense(base + "attention.self." + n, H, H)
        dense(base + "attention.output.dense", H, H)
        ln(base + "attention.output.LayerNorm", H)
        dense(base + "intermediate.dense", H, I)
        dense(base + "output.dense", I, H)
        ln(base + "output.LayerNorm", H)
        if t != "sim":
            for n in ("query", "key", "value"):
                dense(base + "attention.self_ent." + n, E, E)
            dense(base + "attention.output_ent.dense", E, E)
            ln(base + "attention.output_ent.LayerNorm", E)
            dense(base + "intermediate.dense_ent", E, I)
            dense(base + "output.dense_ent", I, E)
            ln(base + "output.LayerNorm_ent", E)
    dense("kangaroo.encoder.linear", H, E)
    dense("kangaroo.encoder.linear2", E + 8, E)
    dense("cls.predictions.transform.dense", H, H)
    ln("cls.predictions.transform.LayerNorm", H)
    s["cls.predictions.bias"] = np.zeros(15, np.float32)
    dense("cls.token_emb", H, E)

    conv = convert_kangaroo(s, cfg)

    def shapes(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(shapes(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.asarray(v).shape
        return out

    ref_shapes = shapes(jax.tree.map(np.asarray, ref))
    for path, shp in shapes(conv).items():
        assert path in ref_shapes, path
        assert ref_shapes[path] == shp, (path, shp, ref_shapes[path])
    # fused qkv layout: q|k|v along the output column axis
    got = conv["kangaroo"]["layer_0"]["attention"]["qkv"]["kernel"]
    want = np.concatenate(
        [s["kangaroo.encoder.layer.0.attention.self.%s.weight" % n].T
         for n in ("query", "key", "value")], axis=1)
    np.testing.assert_array_equal(got, want)


def test_poincare_embedding_tree_structure():
    """Training on a 2-level tree pulls connected pairs closer (in Poincaré
    distance) than unconnected leaf pairs from different branches."""
    from easynlp_tpu.utils.poincare import (PoincareEmbedding,
                                            poincare_distance)

    # root 0; internal 1,2; leaves 3,4 under 1 and 5,6 under 2
    edges = [(3, 1), (4, 1), (5, 2), (6, 2), (1, 0), (2, 0)]
    model = PoincareEmbedding(num_nodes=7, dim=5, seed=1)
    emb = model.train(edges, epochs=60, lr=0.2, n_neg=4, batch_size=6,
                      burn_in=5, seed=1)
    assert np.all(np.isfinite(emb))
    assert np.all(np.linalg.norm(emb, axis=-1) < 1.0)  # inside the ball
    d_edge = np.mean([poincare_distance(emb[a], emb[b]) for a, b in edges])
    d_cross = np.mean([poincare_distance(emb[a], emb[b])
                       for a, b in [(3, 5), (3, 6), (4, 5), (4, 6)]])
    assert d_edge < d_cross
