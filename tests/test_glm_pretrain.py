"""GLM block-infilling pretraining collator (reference
mg_utils/blocklm_utils.py ConstructBlockStrategy): layouts checked against
hand-built arrays, static shapes across modes/epochs, and a from-scratch
pretraining run that learns."""

import numpy as np
import pytest

from easynlp_tpu.appzoo.language_modeling.glm_pretrain import (
    IGNORE,
    GLMPretrainDataset,
    build_block_layout,
    build_gpt_suffix_layout,
    sample_spans,
    sentence_spans,
)

PAD, CLS, MASK, GMASK, SMASK, SOP, EOP, DOT = 0, 20, 21, 22, 23, 24, 25, 19
UDP_IDS = {"mask_id": MASK, "gmask_id": GMASK, "smask_id": SMASK,
           "sop_id": SOP, "eop_id": EOP, "pad_id": PAD, "cls_id": CLS}


class _IdTok:
    """Space-separated int-token stub with GLM-ish specials."""
    pad_token_id = PAD
    cls_token_id = CLS
    mask_token_id = MASK
    gmask_token_id = GMASK
    smask_token_id = SMASK
    sop_token_id = SOP
    eop_token_id = EOP
    all_special_ids = [PAD, CLS, MASK, GMASK, SMASK, SOP, EOP]

    def __call__(self, texts, max_length=16):
        out = []
        for t in texts:
            ids = [int(x) for x in str(t).split()][:max_length]
            out.append(ids + [PAD] * (max_length - len(ids)))
        return {"input_ids": out}

    def get_vocab(self):
        return {str(i): i for i in range(19)} | {"。": DOT}


import random


def test_sample_spans_disjoint_with_gaps():
    rng = random.Random(0)
    for _ in range(50):
        lengths = [rng.randint(1, 4) for _ in range(rng.randint(1, 4))]
        total = sum(lengths) + len(lengths) - 1 + rng.randint(0, 10)
        spans = sample_spans(list(lengths), total, rng, offset=1)
        assert spans is not None
        prev_end = None
        for (s, e), want_len in zip(spans, lengths):
            assert e - s == want_len
            assert s >= 1 and e <= total + 1
            if prev_end is not None:
                assert s > prev_end  # >=1 unmasked token between spans
            prev_end = e


def test_block_layout_single_span_hand_built():
    rng = random.Random(0)
    tokens = np.asarray([CLS, 5, 6, 7, 8, 9])
    ids, labels, pos, blk, sep = build_block_layout(
        tokens, [(2, 4)], [MASK], SOP, EOP, rng, shuffle_blocks=False)
    assert ids == [CLS, 5, MASK, 8, 9, SOP, 6, 7]
    assert labels == [IGNORE] * 5 + [6, 7, EOP]
    assert pos == [0, 1, 2, 3, 4, 2, 2, 2]   # span collapses to one slot
    assert blk == [0, 0, 0, 0, 0, 1, 2, 3]
    assert sep == 5


def test_block_layout_two_spans_hand_built():
    rng = random.Random(0)
    tokens = np.asarray([CLS, 5, 6, 7, 8, 9])
    ids, labels, pos, blk, sep = build_block_layout(
        tokens, [(1, 2), (4, 6)], [MASK, MASK], SOP, EOP, rng,
        shuffle_blocks=False)
    assert ids == [CLS, MASK, 6, 7, MASK, SOP, 5, SOP, 8, 9]
    assert labels == [IGNORE] * 5 + [5, EOP, 8, 9, EOP]
    assert pos == [0, 1, 2, 3, 4, 1, 1, 4, 4, 4]
    assert blk == [0, 0, 0, 0, 0, 1, 2, 1, 2, 3]
    assert sep == 5


def test_gpt_suffix_layout_hand_built():
    tokens = np.asarray([CLS, 5, 6, 7, 8])
    ids, labels, pos, blk, sep = build_gpt_suffix_layout(tokens, 2, GMASK,
                                                         SOP)
    assert ids == [CLS, 5, 6, GMASK, SOP, 7]
    assert labels == [IGNORE] * 4 + [7, 8]   # sop predicts 7, 7 predicts 8
    assert pos == [0, 1, 2, 3, 3, 3]
    assert blk == [0, 0, 0, 0, 1, 2]
    assert sep == 4


def test_sentence_spans_split_on_terminators():
    def is_end(t):
        return t == DOT
    spans = sentence_spans(np.asarray([CLS, 5, 6, DOT, 7, 8, DOT, 9]),
                           is_end, offset=1)
    assert spans == [(1, 4), (4, 7), (7, 8)]


def _write_corpus(tmp_path, n_rows=16, row_len=24):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "corpus.tsv")
    with open(path, "w") as f:
        for i in range(n_rows):
            toks = rng.randint(1, 19, row_len).tolist()
            toks[row_len // 2] = DOT   # a sentence boundary mid-row
            toks[-1] = DOT
            f.write("%d\t%s\n" % (i, " ".join(map(str, toks))))
    return path


def _make_ds(tmp_path, **udp):
    path = _write_corpus(tmp_path)
    return GLMPretrainDataset(
        path, _IdTok(), max_seq_length=48,
        input_schema="id:str:1,text:str:1", first_sequence="text",
        user_defined_parameters={**UDP_IDS, "task_mask": 1, **udp})


@pytest.mark.smoke
def test_bert_mode_shapes_and_invariants(tmp_path):
    ds = _make_ds(tmp_path, bert_prob=1.0)
    for idx in range(len(ds)):
        ex = ds[idx]
        assert ex["input_ids"].shape == (48,)
        real = ex["attention_mask"].astype(bool)
        sep = int(ex["prefix_lengths"])
        ids = ex["input_ids"]
        # Part A: >=1 [MASK], no sop/eop, labels all IGNORE, blocks all 0
        assert (ids[:sep] == MASK).sum() >= 1
        assert not np.isin(ids[:sep], [SOP, EOP]).any()
        assert (ex["labels"][:sep] == IGNORE).all()
        assert (ex["block_position_ids"][:sep] == 0).all()
        # Part B: starts each block with sop; labels end each block with eop
        part_b = ids[sep:][real[sep:]]
        lbl_b = ex["labels"][sep:][real[sep:]]
        assert (part_b == SOP).sum() == (ids[:sep] == MASK).sum()
        assert (lbl_b == EOP).sum() == (part_b == SOP).sum()
        assert (lbl_b != IGNORE).all()
        # padding carries IGNORE labels
        assert (ex["labels"][~real] == IGNORE).all()
        # mask slots and their blocks share the collapsed position
        for m_pos in np.nonzero(ids[:sep] == MASK)[0]:
            p = ex["position_ids"][m_pos]
            owners = np.nonzero((ex["position_ids"] == p)
                                & (ex["block_position_ids"] > 0))[0]
            assert owners.size >= 2  # sop + >=1 span token


@pytest.mark.smoke
def test_gap_sentence_mode_uses_smask_whole_sentences(tmp_path):
    ds = _make_ds(tmp_path, bert_prob=0.0, gap_sentence_prob=1.0)
    ex = ds[0]
    sep = int(ex["prefix_lengths"])
    ids = ex["input_ids"]
    assert (ids[:sep] == SMASK).sum() >= 1
    assert (ids[:sep] == MASK).sum() == 0
    # each masked block reproduces a full sentence (ends with DOT before eop)
    lbl = ex["labels"]
    eops = np.nonzero(lbl == EOP)[0]
    for e in eops[:-1] if len(eops) > 1 else eops:
        assert lbl[e - 1] == DOT or e == sep  # sentence-final token


@pytest.mark.smoke
def test_gpt_mode_suffix_and_span_layouts(tmp_path):
    suffix = _make_ds(tmp_path, bert_prob=0.0, gpt_infill_prob=1.0)
    ex = suffix[0]
    sep = int(ex["prefix_lengths"])
    ids = ex["input_ids"]
    assert ids[sep - 1] == GMASK and ids[sep] == SOP
    assert (ids == GMASK).sum() == 1 and (ids == SOP).sum() == 1
    # generation covers >= gpt_min_ratio of the row
    real = int(ex["attention_mask"].sum())
    assert (ex["labels"] != IGNORE).sum() >= 0.3 * real

    span = _make_ds(tmp_path, bert_prob=0.0, gpt_infill_prob=0.0)
    ex = span[0]
    sep = int(ex["prefix_lengths"])
    assert (ex["input_ids"][:sep] == GMASK).sum() == 1
    assert EOP in ex["labels"]  # span layout closes with eop


@pytest.mark.smoke
def test_dynamic_corruption_across_epochs_and_determinism(tmp_path):
    ds = _make_ds(tmp_path)
    a0 = ds[0]["input_ids"].copy()
    ds.set_epoch(1)
    a1 = ds[0]["input_ids"].copy()
    assert not np.array_equal(a0, a1)    # fresh blanks per epoch
    ds.set_epoch(0)
    np.testing.assert_array_equal(ds[0]["input_ids"], a0)  # reproducible


def test_glm_pretraining_from_scratch_learns(tmp_path):
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.appzoo.sequence_generation.glm import (
        GLMSequenceGeneration)
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.modelzoo.models.glm.modeling_glm import GLMConfig
    from easynlp_tpu.testing import make_args

    ds = _make_ds(tmp_path)
    cfg = GLMConfig(vocab_size=32, hidden_size=32, num_layers=2,
                    num_attention_heads=4, max_sequence_length=96,
                    embedding_dropout_prob=0.0, attention_dropout_prob=0.0,
                    output_dropout_prob=0.0)
    module = GLMSequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = GLMSequenceGeneration.init_params(module, cfg)
    app = GLMSequenceGeneration(module, params, cfg)
    args = make_args(micro_batch_size=8, sequence_length=48,
                     dtype="float32", epoch_num=2.0, logging_steps=10**9,
                     checkpoint_dir=None, learning_rate=5e-3)
    tr = Trainer(app, ds, evaluator=None, args=args)
    batch = next(iter(tr.train_loader))
    batch.pop("_valid", None)
    db = jax.device_put(batch, tr.batch_shard)
    p, o = tr.params, tr.opt_state
    losses = []
    for s in range(8):
        p, o, m = tr._train_step(p, o, db, s)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]   # random-blank pretraining learns
