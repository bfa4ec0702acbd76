"""Weight-only int8 quantization for inference/serving: round-trip error
bound, logits parity on a classify app, predictor + pipeline integration.

Capability beyond the reference (its serving is torch eager fp32/fp16);
TPU rationale in modelzoo/quantization.py."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
from make_fixtures import make_pretrained  # noqa: E402

from easynlp_tpu.modelzoo.quantization import (  # noqa: E402
    dequantize_params,
    is_quantized,
    quantization_report,
    quantize_params,
)
from easynlp_tpu.testing import make_args  # noqa: E402


def test_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    q = quantize_params({"dense": {"kernel": w}})
    assert is_quantized(q)
    back = dequantize_params(q)["dense"]["kernel"]
    # symmetric per-channel int8: worst-case error is scale/2 = absmax/254
    col_absmax = np.max(np.abs(np.asarray(w)), axis=0)
    err = np.max(np.abs(np.asarray(back) - np.asarray(w)), axis=0)
    assert np.all(err <= col_absmax / 254.0 + 1e-7)


def test_scan_stacked_kernels_get_per_layer_scales():
    """nn.scan-stacked [L, in, out] kernels must quantize with independent
    per-(layer, out-channel) scales: an outlier layer must not inflate the
    rounding error of the small layers sharing its stack."""
    rng = np.random.RandomState(0)
    w = rng.randn(4, 64, 32).astype(np.float32) * 0.02
    w[3] *= 100.0  # outlier layer
    q = quantize_params({"h": {"kernel": jnp.asarray(w)}})
    sub = q["h"]["kernel"]
    assert sub["scale"].shape == (4, 1, 32)
    back = np.asarray(dequantize_params(q)["h"]["kernel"])
    for layer in range(4):
        absmax = np.max(np.abs(w[layer]), axis=0)
        err = np.max(np.abs(back[layer] - w[layer]), axis=0)
        assert np.all(err <= absmax / 254.0 + 1e-7), layer


def test_identity_on_unquantized_and_skips():
    rng = np.random.RandomState(1)
    params = {
        "embeddings": {"word_embeddings":
                       jnp.asarray(rng.randn(100, 64), jnp.float32)},
        "layer_norm": {"scale": jnp.ones((64,), jnp.float32)},
        "small": {"kernel": jnp.asarray(rng.randn(4, 4), jnp.float32)},
        "dense": {"kernel": jnp.asarray(rng.randn(64, 128), jnp.float32),
                  "bias": jnp.zeros((128,), jnp.float32)},
    }
    q = quantize_params(params)
    # embeddings / norms / small / bias untouched
    assert not is_quantized({"e": q["embeddings"]})
    assert not is_quantized({"l": q["layer_norm"]})
    assert not is_quantized({"s": q["small"]})
    assert q["dense"]["bias"] is params["dense"]["bias"]
    assert is_quantized({"d": q["dense"]})
    # dequantize is identity on plain trees
    plain = dequantize_params(params)
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def classify_app(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("quant"))
    model_dir = make_pretrained(os.path.join(base, "tiny-bert"))
    make_args()
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    app = SequenceClassification.from_pretrained(
        model_dir, dtype=jnp.float32, num_labels=3)
    return app, model_dir


def test_logits_parity_on_classify(classify_app):
    app, _ = classify_app
    rng = np.random.RandomState(2)
    ids = rng.randint(1, 70, (4, 16)).astype(np.int32)
    mask = np.ones_like(ids)
    full = app.module.apply({"params": app.params}, input_ids=ids,
                            attention_mask=mask, deterministic=True)
    qparams = quantize_params(app.params)
    qb, ob, n = quantization_report(qparams)
    assert n > 0 and qb < 0.5 * ob

    @jax.jit
    def qfwd(p, ids, mask):
        return app.module.apply({"params": dequantize_params(p)},
                                input_ids=ids, attention_mask=mask,
                                deterministic=True)

    ql = qfwd(qparams, ids, mask)
    a = np.asarray(full["logits"], np.float64)
    b = np.asarray(ql["logits"], np.float64)
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    # argmax predictions unchanged on this margin-y random model
    assert np.array_equal(a.argmax(-1), b.argmax(-1))


def test_predictor_runs_quantized(classify_app):
    app, model_dir = classify_app
    from easynlp_tpu.core.predictor import PyModelPredictor
    plain = PyModelPredictor(app, [("input_ids", np.int32),
                                   ("attention_mask", np.int32)],
                             ["logits"], batch_size=4)
    rng = np.random.RandomState(3)
    data = {"input_ids": rng.randint(1, 70, (6, 16)).astype(np.int32),
            "attention_mask": np.ones((6, 16), np.int32)}
    ref = plain.predict(dict(data))["logits"]

    import copy
    qapp = copy.copy(app)
    qapp.params = quantize_params(app.params)
    qpred = PyModelPredictor(qapp, [("input_ids", np.int32),
                                    ("attention_mask", np.int32)],
                             ["logits"], batch_size=4)
    out = qpred.predict(dict(data))["logits"]
    assert out.shape == ref.shape
    assert np.array_equal(np.asarray(ref).argmax(-1),
                          np.asarray(out).argmax(-1))


def test_seq2seq_generation_with_quantized_params():
    """Encoder-decoder generation runs with an int8 params tree (dequant
    inside prefill/decode), and prefill logits match full precision."""
    from easynlp_tpu.appzoo.sequence_generation.model import (
        SequenceGeneration)
    from easynlp_tpu.modelzoo.models.bart import BartConfig
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        encoder_decoder_generate, make_encoder_decoder_fns)

    make_args()
    cfg = BartConfig(vocab_size=120, d_model=32, encoder_layers=2,
                     decoder_layers=2, encoder_attention_heads=4,
                     decoder_attention_heads=4, encoder_ffn_dim=64,
                     decoder_ffn_dim=64, max_position_embeddings=64,
                     dropout=0.0, attention_dropout=0.0,
                     activation_dropout=0.0)
    m = SequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = SequenceGeneration.init_params(m, cfg)
    ids = np.random.RandomState(3).randint(3, 120, (2, 7))
    mask = np.ones((2, 7), np.int32)
    qparams = quantize_params(params, min_size=512)
    assert is_quantized(qparams)

    # prefill logits parity (deterministic; no decode-divergence flakiness)
    prefill, _ = make_encoder_decoder_fns(m, 12, jnp.asarray(ids),
                                          jnp.asarray(mask))
    start = jnp.full((2, 1), 2, jnp.int32)
    smask = jnp.ones((2, 1), jnp.int32)
    lf, _ = prefill(params, start, smask)
    lq, _ = prefill(qparams, start, smask)
    a, b = np.asarray(lf, np.float64), np.asarray(lq, np.float64)
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos

    # full greedy + beam decode execute on the quantized tree
    for beams in (1, 2):
        seqs = np.asarray(encoder_decoder_generate(
            m, qparams, jnp.asarray(ids), jnp.asarray(mask), max_length=8,
            num_beams=beams))
        assert seqs.shape[0] == 2
        assert (seqs >= 0).all() and (seqs < 120).all()


def test_pipeline_quantize_int8(tmp_path):
    """pipeline(model_dir, quantize='int8') end-to-end on a saved classify
    checkpoint."""
    base = str(tmp_path)
    model_dir = make_pretrained(os.path.join(base, "tiny-bert"))
    make_args()
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    app = SequenceClassification.from_pretrained(
        model_dir, dtype=jnp.float32, num_labels=2)
    ckpt = os.path.join(base, "ck")
    os.makedirs(ckpt)
    from easynlp_tpu.modelzoo.modeling_utils import save_params
    save_params(app.params, ckpt)
    for extra in ("vocab.txt", "config.json"):
        with open(os.path.join(model_dir, extra)) as f:
            data = f.read()
        with open(os.path.join(ckpt, extra), "w") as f:
            f.write(data)
    with open(os.path.join(ckpt, "label_mapping.json"), "w") as f:
        json.dump({"neg": 0, "pos": 1}, f)
    with open(os.path.join(ckpt, "train_config.json"), "w") as f:
        json.dump({"app_name": "text_classify"}, f)

    from easynlp_tpu.pipelines import pipeline
    pipe = pipeline("text_classify", ckpt, quantize="int8",
                    dtype=jnp.float32, sequence_length=16, batch_size=4)
    from easynlp_tpu.modelzoo.quantization import is_quantized as isq
    assert isq(pipe.predictor.model_predictor.app.params)
    out = pipe(["good stuff", "bad stuff", "meh"])
    assert len(out) == 3
    assert all("predictions" in r or "label" in r or "logits" in r
               for r in out)


def test_int8_kv_cache_generation():
    """int8 KV cache (per-token-per-head scales): decode logits stay close
    to the full-precision cache, and greedy/beam/speculative all run on the
    quantized cache (beam reindex gathers the scales)."""
    import jax

    from easynlp_tpu.modelzoo.generation_utils import generate, left_pad
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)

    cfg = GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    params = nn.unbox(params)

    pids, pmask = left_pad([[5, 6, 7, 8], [9, 10, 11]], pad_token_id=0,
                           length=5)
    fp_prefill, fp_decode = make_gpt2_generation_fns(m, 16)
    q_prefill, q_decode = make_gpt2_generation_fns(m, 16, kv_cache="int8")

    lf, cf = fp_prefill(params, jnp.asarray(pids), jnp.asarray(pmask))
    lq, cq = q_prefill(params, jnp.asarray(pids), jnp.asarray(pmask))
    assert cq["k"].dtype == jnp.int8 and "k_scale" in cq
    a, b = np.asarray(lf, np.float64), np.asarray(lq, np.float64)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99, cos

    tok = jnp.argmax(lq, -1)[:, None].astype(jnp.int32)
    ld_f, _ = fp_decode(params, tok, cf)
    ld_q, _ = q_decode(params, tok, cq)
    a, b = np.asarray(ld_f, np.float64), np.asarray(ld_q, np.float64)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99, cos

    greedy = np.asarray(generate(q_prefill, q_decode, params,
                                 jnp.asarray(pids), jnp.asarray(pmask),
                                 max_length=16, pad_token_id=0))
    assert greedy.shape == (2, 16)
    beams = np.asarray(generate(q_prefill, q_decode, params,
                                jnp.asarray(pids), jnp.asarray(pmask),
                                max_length=16, num_beams=3, eos_token_id=96,
                                pad_token_id=0))
    assert beams.shape == (2, 16)

    sp, sd = make_gpt2_generation_fns(m, 16, kv_cache="int8", cache_slack=5)
    spec = np.asarray(generate(sp, sd, params, jnp.asarray(pids),
                               jnp.asarray(pmask), max_length=16,
                               pad_token_id=0, speculative="prompt_lookup",
                               num_draft_tokens=4))
    assert spec.shape == (2, 16)
    assert (spec >= 0).all() and (spec < 97).all()


def test_cast_params_skips_and_composes():
    """cast_params: float kernels + embeddings -> bf16; LayerNorm scale/
    shift and biases stay f32; int8 marker subtrees pass through; ints
    untouched."""
    from easynlp_tpu.modelzoo.quantization import cast_params
    rng = np.random.RandomState(2)
    params = {
        "embeddings": {"word_embeddings":
                       jnp.asarray(rng.randn(100, 64), jnp.float32)},
        "layer_norm": {"scale": jnp.ones((64,), jnp.float32),
                       "bias": jnp.zeros((64,), jnp.float32)},
        "dense": {"kernel": jnp.asarray(rng.randn(64, 128), jnp.float32),
                  "bias": jnp.zeros((128,), jnp.float32)},
        "steps": jnp.asarray(3, jnp.int32),
    }
    c = cast_params(params)
    assert c["embeddings"]["word_embeddings"].dtype == jnp.bfloat16
    assert c["dense"]["kernel"].dtype == jnp.bfloat16
    assert c["layer_norm"]["scale"].dtype == jnp.float32
    assert c["layer_norm"]["bias"].dtype == jnp.float32
    assert c["dense"]["bias"].dtype == jnp.float32
    assert c["steps"].dtype == jnp.int32

    # quantize-then-cast: int8 subtree untouched, remainder cast
    q = quantize_params(params)
    qc = cast_params(q)
    assert qc["dense"]["kernel"]["__int8_weight__"].dtype == jnp.int8
    assert qc["dense"]["kernel"]["scale"].dtype == jnp.float32
    assert qc["embeddings"]["word_embeddings"].dtype == jnp.bfloat16


def test_cast_params_decode_token_match():
    """bf16-weight greedy decode matches the f32-weight decode on a tiny
    bf16-compute model: operands are rounded to bf16 at the matmuls either
    way, so outputs should agree (tiny model, short generation)."""
    from easynlp_tpu.modelzoo.generation_utils import (greedy_or_sample,
                                                       left_pad)
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)
    from easynlp_tpu.modelzoo.quantization import cast_params
    from flax import linen as nn

    cfg = GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = nn.unbox(m.init({"params": rng, "dropout": rng},
                             input_ids=jnp.ones((1, 4), jnp.int32),
                             deterministic=True)["params"])
    pids, pmask = left_pad([[5, 6, 7, 5, 6, 7], [11, 23, 42]],
                           pad_token_id=0, length=6)
    prefill, decode = make_gpt2_generation_fns(m, 20)
    ref, _ = greedy_or_sample(prefill, decode, params, jnp.asarray(pids),
                              jnp.asarray(pmask), 20, pad_token_id=0)
    out, _ = greedy_or_sample(prefill, decode, cast_params(params),
                              jnp.asarray(pids), jnp.asarray(pmask), 20,
                              pad_token_id=0)
    ref, out = np.asarray(ref), np.asarray(out)
    assert out.shape == ref.shape
    # bf16-compute both sides: expect near-total agreement on a tiny model
    assert (out == ref).mean() > 0.9, (out, ref)


def test_pipeline_params_dtype(tmp_path):
    """pipeline(..., params_dtype='bfloat16') casts the loaded kernels."""
    base = str(tmp_path)
    model_dir = make_pretrained(os.path.join(base, "tiny-bert"))
    make_args()
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    app = SequenceClassification.from_pretrained(
        model_dir, dtype=jnp.float32, num_labels=2)
    ckpt = os.path.join(base, "ck")
    os.makedirs(ckpt)
    from easynlp_tpu.modelzoo.modeling_utils import save_params
    save_params(app.params, ckpt)
    for extra in ("vocab.txt", "config.json"):
        with open(os.path.join(model_dir, extra)) as f:
            data = f.read()
        with open(os.path.join(ckpt, extra), "w") as f:
            f.write(data)
    with open(os.path.join(ckpt, "label_mapping.json"), "w") as f:
        json.dump({"neg": 0, "pos": 1}, f)
    with open(os.path.join(ckpt, "train_config.json"), "w") as f:
        json.dump({"app_name": "text_classify"}, f)

    from easynlp_tpu.pipelines import pipeline
    pipe = pipeline("text_classify", ckpt, params_dtype="bfloat16",
                    sequence_length=16, batch_size=4)
    leaves = jax.tree.leaves(pipe.predictor.model_predictor.app.params)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in leaves)
    assert any(getattr(l, "dtype", None) == jnp.float32 for l in leaves)
    out = pipe(["good stuff", "bad stuff"])
    assert len(out) == 2
