"""GLM blank-infilling finetune + cached generation (reference
mg_utils/finetune_glm.py:304 recipe): cloze dataset layout, Trainer run,
and cache/no-cache token-exactness of the Part-B decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.modelzoo.models.glm.modeling_glm import (
    GLMConfig,
    GLMForConditionalGeneration,
)

GMASK, SOP, EOP, PAD = 26, 27, 28, 0


def _tiny_cfg():
    return GLMConfig(vocab_size=30, hidden_size=32, num_layers=2,
                     num_attention_heads=4, max_sequence_length=64,
                     embedding_dropout_prob=0.0, attention_dropout_prob=0.0,
                     output_dropout_prob=0.0)


def _app():
    from easynlp_tpu.appzoo.sequence_generation.glm import (
        GLMSequenceGeneration)
    cfg = _tiny_cfg()
    module = GLMSequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = GLMSequenceGeneration.init_params(module, cfg)
    return GLMSequenceGeneration(module, params, cfg)


class _IdTok:
    """Minimal tokenizer: space-separated int tokens."""
    pad_token_id = PAD

    def __call__(self, texts, max_length=16):
        out = []
        for t in texts:
            ids = [int(x) for x in str(t).split()][:max_length]
            out.append(ids + [PAD] * (max_length - len(ids)))
        return {"input_ids": out,
                "attention_mask": [[1 if x != PAD else 0 for x in row]
                                   for row in out]}


@pytest.fixture(scope="module")
def glm_ds(tmp_path_factory):
    from easynlp_tpu.appzoo.sequence_generation.glm import (
        GLMSequenceGenerationDataset)
    base = tmp_path_factory.mktemp("glm")
    path = str(base / "rows.tsv")
    with open(path, "w") as f:
        for i in range(8):
            f.write("5 6 7\t%d %d\n" % (10 + i % 3, 11 + i % 3))
    return GLMSequenceGenerationDataset(
        path, _IdTok(), max_seq_length=16, max_target_length=4,
        input_schema="src:str:1,tgt:str:1", first_sequence="src",
        second_sequence="tgt",
        user_defined_parameters={"gmask_id": GMASK, "sop_id": SOP,
                                 "eop_id": EOP, "pad_id": PAD,
                                 "src_len": 6, "tgt_len": 4})


def test_glm_cloze_layout(glm_ds):
    ex = glm_ds[0]
    ids = ex["input_ids"]
    # [5 6 7 gMASK sop 10 11 eop pad...]
    np.testing.assert_array_equal(ids[:8],
                                  [5, 6, 7, GMASK, SOP, 10, 11, EOP])
    np.testing.assert_array_equal(ex["position_ids"][:8],
                                  [0, 1, 2, 3, 3, 3, 3, 3])
    np.testing.assert_array_equal(ex["block_position_ids"][:8],
                                  [0, 0, 0, 0, 1, 2, 3, 4])
    assert ex["prefix_lengths"] == 4
    # sop predicts 10, 10 predicts 11, 11 predicts eop; rest ignored
    np.testing.assert_array_equal(ex["labels"][:8],
                                  [-100, -100, -100, -100, 10, 11, EOP,
                                   -100])


def test_glm_finetune_trains(glm_ds, tmp_path):
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import make_args

    args = make_args(micro_batch_size=8, sequence_length=16,
                     dtype="float32", epoch_num=2.0, logging_steps=10**9,
                     checkpoint_dir=str(tmp_path / "ck"),
                     learning_rate=5e-3)
    app = _app()
    tr = Trainer(app, glm_ds, evaluator=None, args=args)
    first = None
    batch = next(iter(tr.train_loader))
    batch.pop("_valid", None)
    db = jax.device_put(batch, tr.batch_shard)
    p, o = tr.params, tr.opt_state
    losses = []
    for s in range(8):
        p, o, m = tr._train_step(p, o, db, s)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]          # the cloze objective trains


def test_glm_cached_generation_token_exact(glm_ds):
    """Cached greedy Part-B decode must equal the no-cache argmax rollout
    (full forward re-run each step with explicit 2D positions)."""
    app = _app()
    module, params = app.module, app.params
    src = jnp.asarray([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.int32)
    max_gen = 5
    out = np.asarray(app.generate(src, mask, max_length=max_gen,
                                  gmask_id=GMASK, sop_id=SOP, eop_id=EOP,
                                  pad_id=PAD))
    assert out.shape == (2, max_gen)

    # no-cache reference rollout per sample
    for i in range(2):
        toks = [int(t) for t, keep in zip(np.asarray(src)[i],
                                          np.asarray(mask)[i]) if keep]
        n = len(toks)
        seq = toks + [GMASK, SOP]
        pos = list(range(n + 1)) + [n]
        blocks = [0] * (n + 1) + [1]
        generated = []
        for step in range(max_gen):
            o = module.apply(
                {"params": params},
                input_ids=jnp.asarray([seq], jnp.int32),
                position_ids=jnp.asarray([pos], jnp.int32),
                block_position_ids=jnp.asarray([blocks], jnp.int32),
                prefix_lengths=jnp.asarray([n + 1], jnp.int32),
                deterministic=True)
            nxt = int(jnp.argmax(o["logits"][0, -1]))
            generated.append(nxt)
            if nxt == EOP:
                break
            seq.append(nxt)
            pos.append(n)
            blocks.append(blocks[-1] + 1)
        want = generated + [PAD] * (max_gen - len(generated))
        got = out[i].tolist()
        # after the first EOP both are padding
        cut = min(len(generated), max_gen)
        assert got[:cut] == want[:cut], (i, got, want)


def test_glm_speculative_token_exact():
    """Prompt-lookup speculative Part-B decode equals plain cached greedy
    (GLM 2D positions + blank-infilling bias through the chunk path)."""
    app = _app()
    src = jnp.asarray([[5, 6, 5, 6], [8, 9, 8, 9]], jnp.int32)
    mask = jnp.ones((2, 4), jnp.int32)
    kw = dict(gmask_id=GMASK, sop_id=SOP, eop_id=EOP, pad_id=PAD)
    ref = np.asarray(app.generate(src, mask, max_length=8, **kw))
    spec = np.asarray(app.generate(src, mask, max_length=8,
                                   speculative="prompt_lookup",
                                   num_draft_tokens=3, **kw))
    np.testing.assert_array_equal(spec, ref)


def test_glm_transformer_xl_mems_segment_parity():
    """Two segments streamed with Transformer-XL memories must reproduce the
    full-sequence causal forward exactly (mems carry each layer's input
    hiddens; reference mpu_transformer.py:854-867): the round-4 parity
    check for mem-trained reference GLM checkpoints."""
    app = _app()
    module, params = app.module, app.params
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, 26, (2, 16)), jnp.int32)

    # full pass: causal (prefix 0), absolute positions
    full = module.apply(
        {"params": params}, input_ids=ids,
        position_ids=jnp.broadcast_to(jnp.arange(16)[None], (2, 16)),
        block_position_ids=jnp.zeros((2, 16), jnp.int32),
        prefix_lengths=jnp.zeros((2,), jnp.int32),
        deterministic=True)["logits"]

    streamed = app.stream_logits(ids, segment_length=8, mem_length=8)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               atol=2e-5)


def test_glm_mems_sliding_window_mask():
    """mem window smaller than the history: memories stay right-aligned
    (most recent positions) and the mask fills up then saturates."""
    app = _app()
    module, params = app.module, app.params
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    mems = module.init_mems(1, 6)
    assert mems["h"].shape == (2, 1, 6, 32)
    np.testing.assert_array_equal(np.asarray(mems["mask"]), 0)

    out = module.apply(
        {"params": params}, input_ids=ids,
        position_ids=jnp.arange(4)[None],
        block_position_ids=jnp.zeros((1, 4), jnp.int32),
        prefix_lengths=jnp.zeros((1,), jnp.int32),
        mems=mems, deterministic=True)
    m1 = out["mems"]
    np.testing.assert_array_equal(np.asarray(m1["mask"]),
                                  [[0, 0, 1, 1, 1, 1]])
    out = module.apply(
        {"params": params}, input_ids=ids,
        position_ids=(4 + jnp.arange(4))[None],
        block_position_ids=jnp.zeros((1, 4), jnp.int32),
        prefix_lengths=jnp.zeros((1,), jnp.int32),
        mems=m1, deterministic=True)
    m2 = out["mems"]
    np.testing.assert_array_equal(np.asarray(m2["mask"]), 1)
    # the window slid: m1 held [0,0,s1_0..s1_3]; after segment 2's four
    # tokens the oldest four slots (two zeros + s1_0, s1_1) dropped, so
    # m2[:2] are m1's slots 4..5 (= s1_2, s1_3) and the rest is segment 2
    np.testing.assert_allclose(np.asarray(m2["h"][:, :, :2]),
                               np.asarray(m1["h"][:, :, 4:6]), atol=0)
