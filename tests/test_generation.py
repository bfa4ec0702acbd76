import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.modelzoo.generation_utils import (
    apply_no_repeat_ngram,
    apply_top_k,
    apply_top_p,
    generate,
    left_pad,
)
from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
from easynlp_tpu.modelzoo.models.gpt2.generation import make_gpt2_generation_fns

TINY = dict(vocab_size=97, n_positions=64, n_embd=32, n_layer=2, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)


def _tiny_model():
    cfg = GPT2Config(**TINY)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    return m, nn.unbox(params)


def test_left_pad():
    ids, mask = left_pad([[1, 2, 3], [4]], pad_token_id=0, length=4)
    np.testing.assert_array_equal(ids, [[0, 1, 2, 3], [0, 0, 0, 4]])
    np.testing.assert_array_equal(mask, [[0, 1, 1, 1], [0, 0, 0, 1]])


def test_top_k_top_p():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    topk = apply_top_k(logits, 2)
    assert np.isfinite(np.asarray(topk)[0, :2]).all()
    assert (np.asarray(topk)[0, 2:] < -1e6).all()
    topp = apply_top_p(logits, 0.75)
    kept = np.asarray(topp)[0] > -1e6
    np.testing.assert_array_equal(kept, [True, True, False, False])


def test_no_repeat_ngram():
    # sequence buffer [1,2,3,1,2,?] with cur_len=5, ngram=3: prefix (1,2)
    # matched at position 0 → token 3 banned
    seqs = jnp.array([[1, 2, 3, 1, 2, 0, 0, 0]])
    logits = jnp.zeros((1, 10))
    out = apply_no_repeat_ngram(logits, seqs, jnp.asarray(5), 3)
    out = np.asarray(out)[0]
    assert out[3] < -1e6
    assert (out[np.arange(10) != 3] > -1e6).all()


def test_cached_decode_matches_full_forward():
    """Prefill+decode logits must equal uncached full-sequence logits."""
    m, params = _tiny_model()
    ids = np.random.RandomState(0).randint(1, 97, (2, 10)).astype(np.int32)
    full = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                   deterministic=True)["logits"]
    prefill, decode = make_gpt2_generation_fns(m, max_length=16)
    mask = np.ones((2, 10), np.int32)
    logits_p, cache = prefill(params, jnp.asarray(ids[:, :9]),
                              jnp.asarray(mask[:, :9]))
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(full[:, 8]), atol=2e-4)
    logits_d, cache = decode(params, jnp.asarray(ids[:, 9:10]), cache)
    np.testing.assert_allclose(np.asarray(logits_d),
                               np.asarray(full[:, 9]), atol=2e-4)


def test_greedy_generation_runs_and_is_deterministic():
    m, params = _tiny_model()
    prefill, decode = make_gpt2_generation_fns(m, max_length=20)
    pids, pmask = left_pad([[5, 6, 7], [8, 9]], pad_token_id=0, length=4)
    seqs1 = generate(prefill, decode, params, jnp.asarray(pids),
                     jnp.asarray(pmask), max_length=20, pad_token_id=0)
    seqs2 = generate(prefill, decode, params, jnp.asarray(pids),
                     jnp.asarray(pmask), max_length=20, pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(seqs1), np.asarray(seqs2))
    assert seqs1.shape == (2, 20)


def test_beam_generation_runs():
    m, params = _tiny_model()
    prefill, decode = make_gpt2_generation_fns(m, max_length=16)
    pids, pmask = left_pad([[5, 6, 7], [8, 9]], pad_token_id=0, length=4)
    seqs = generate(prefill, decode, params, jnp.asarray(pids),
                    jnp.asarray(pmask), max_length=16, num_beams=3,
                    eos_token_id=96, pad_token_id=0)
    assert seqs.shape == (2, 16)


def test_beam_num_return_sequences():
    """num_return_sequences > 1 returns [B, N, T] with beam 0 equal to the
    single-best result (reference num_return_sequences semantics)."""
    m, params = _tiny_model()
    prefill, decode = make_gpt2_generation_fns(m, max_length=16)
    pids, pmask = left_pad([[5, 6, 7], [8, 9]], pad_token_id=0, length=4)
    best = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                               jnp.asarray(pmask), max_length=16,
                               num_beams=3, eos_token_id=96, pad_token_id=0))
    top = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                              jnp.asarray(pmask), max_length=16, num_beams=3,
                              eos_token_id=96, pad_token_id=0,
                              num_return_sequences=3))
    assert top.shape == (2, 3, 16)
    np.testing.assert_array_equal(top[:, 0], best)
    # hypotheses within a row are distinct beams
    assert not np.array_equal(top[0, 0], top[0, 1]) or \
        not np.array_equal(top[0, 0], top[0, 2])


def test_gpt2_parity_vs_torch():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.GPT2Config(**TINY)
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.gpt2.conversion import (
        convert_gpt2_state_dict)
    cfg = GPT2Config(**TINY)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    params = convert_gpt2_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(0).randint(0, 97, (2, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=3e-4)


def test_beam_sample_generation():
    """beam-sample (reference generation_utils.py:1373): stochastic beam
    candidates — different rngs give different outputs, fixed rng is
    deterministic."""
    m, params = _tiny_model()
    prefill, decode = make_gpt2_generation_fns(m, 24)
    ids = jnp.ones((2, 4), jnp.int32) * 5
    mask = jnp.ones((2, 4), jnp.int32)

    def run(seed):
        return np.asarray(generate(
            prefill, decode, params, ids, mask, max_length=24, num_beams=4,
            do_sample=True, temperature=1.2, top_k=50,
            rng=jax.random.PRNGKey(seed), eos_token_id=None, pad_token_id=0))

    a, b1, c = run(0), run(0), run(1)
    np.testing.assert_array_equal(a, b1)            # deterministic in rng
    assert not np.array_equal(a, c)                 # varies across rngs
    assert a.shape == (2, 24)
    assert (a[:, :4] == 5).all()                    # prompt preserved
    assert (a >= 0).all() and (a < 97).all()


def test_group_beam_search_diversity():
    """Diverse beam (reference generation_utils.py:1148): with a large
    diversity penalty the two groups' first generated tokens differ; with
    penalty 0 and identical init the groups collapse to the same frontier."""
    m, params = _tiny_model()
    prefill, decode = make_gpt2_generation_fns(m, 16)
    ids = jnp.ones((1, 4), jnp.int32) * 7
    mask = jnp.ones((1, 4), jnp.int32)
    from easynlp_tpu.modelzoo.generation_utils import beam_search

    # run the full beam state machine but inspect the returned best sequence
    # via per-group frontiers: easiest observable — generations differ when
    # the penalty forces group 2 off group 1's argmax token
    out_div = np.asarray(beam_search(
        prefill, decode, params, ids, mask, 16, num_beams=4,
        num_beam_groups=2, diversity_penalty=1e9, eos_token_id=None,
        pad_token_id=0))
    out_plain = np.asarray(beam_search(
        prefill, decode, params, ids, mask, 16, num_beams=4,
        eos_token_id=None, pad_token_id=0))
    assert out_div.shape == out_plain.shape == (1, 16)
    # the diverse run still returns a valid best sequence
    assert (out_div[:, :4] == 7).all()
    # and plain beam equals the old single-group behaviour (regression)
    out_group1 = np.asarray(beam_search(
        prefill, decode, params, ids, mask, 16, num_beams=4,
        num_beam_groups=1, diversity_penalty=0.0, eos_token_id=None,
        pad_token_id=0))
    np.testing.assert_array_equal(out_plain, out_group1)


def test_copy_restricted_decoding_app_level():
    """App-level copy-restricted decoding (reference appzoo/
    sequence_generation/model.py:181-229): every generated token must come
    from its own source row (+ specials), per sample."""
    from easynlp_tpu.appzoo.sequence_generation.model import (
        SequenceGeneration)
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config
    from easynlp_tpu.testing import make_args

    make_args()
    cfg = GPT2Config(**dict(TINY, eos_token_id=96, bos_token_id=96,
                            pad_token_id=0))
    cfg.is_encoder_decoder = False
    module = SequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = SequenceGeneration.init_params(module, cfg)
    app = SequenceGeneration(module, params, cfg)

    src = np.array([[11, 12, 13, 14], [21, 22, 23, 24]], np.int32)
    mask = np.ones_like(src)
    out = np.asarray(app.generate(jnp.asarray(src), jnp.asarray(mask),
                                  max_length=16, copy_constrained=True))
    specials = {cfg.eos_token_id, cfg.pad_token_id or 0, 0}
    for row, source in zip(out, src):
        allowed = set(source.tolist()) | specials
        assert set(row[4:].tolist()).issubset(allowed), (row, allowed)
    # rows restrict independently: row 0 may not emit row 1's tokens
    assert not (set(out[0, 4:].tolist()) & {21, 22, 23, 24})


def test_app_generate_jit_cache():
    """app.generate traces the whole generation once per (shape, config) and
    returns the same tokens as the eager path."""
    from easynlp_tpu.appzoo.sequence_generation.model import (
        SequenceGeneration)
    from easynlp_tpu.testing import make_args

    make_args()
    cfg = GPT2Config(**dict(TINY, eos_token_id=96, bos_token_id=96,
                            pad_token_id=0))
    cfg.is_encoder_decoder = False
    module = SequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = SequenceGeneration.init_params(module, cfg)
    app = SequenceGeneration(module, params, cfg)

    src = np.array([[11, 12, 13, 14], [21, 22, 23, 24]], np.int32)
    mask = np.ones_like(src)
    eager = np.asarray(app.generate(jnp.asarray(src), jnp.asarray(mask),
                                    max_length=12, jit_compile=False))
    jit1 = np.asarray(app.generate(jnp.asarray(src), jnp.asarray(mask),
                                   max_length=12))
    np.testing.assert_array_equal(jit1, eager)
    assert len(app._gen_cache) == 1
    # same shapes + config → cache hit, no new entry
    jit2 = np.asarray(app.generate(jnp.asarray(src), jnp.asarray(mask),
                                   max_length=12))
    np.testing.assert_array_equal(jit2, eager)
    assert len(app._gen_cache) == 1
    # different decode config → second entry
    app.generate(jnp.asarray(src), jnp.asarray(mask), max_length=12,
                 num_beams=2)
    assert len(app._gen_cache) == 2
    # copy-constrained path jits too (mask is a traced argument)
    out = np.asarray(app.generate(jnp.asarray(src), jnp.asarray(mask),
                                  max_length=12, copy_constrained=True))
    specials = {96, 0}
    for row, source in zip(out, src):
        assert set(row[4:].tolist()).issubset(set(source.tolist()) | specials)


def test_app_generate_decoder_only_right_padded_prompts():
    """The predictor tokenizes RIGHT-padded; decoder-only app.generate must
    normalize to the engine's left-padded contract and treat max_length as
    NEW tokens (reference max_decoder_length) — right- and left-padded
    encodings of the same prompts must generate identical tokens."""
    from easynlp_tpu.appzoo.sequence_generation.model import (
        SequenceGeneration)
    from easynlp_tpu.testing import make_args

    make_args()
    cfg = GPT2Config(**dict(TINY, eos_token_id=96, bos_token_id=96,
                            pad_token_id=0))
    cfg.is_encoder_decoder = False
    module = SequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = SequenceGeneration.init_params(module, cfg)
    app = SequenceGeneration(module, params, cfg)

    right = np.array([[11, 12, 13, 0, 0, 0],
                      [21, 22, 23, 24, 25, 0]], np.int32)
    rmask = (right != 0).astype(np.int32)
    left = np.array([[0, 0, 0, 11, 12, 13],
                     [0, 21, 22, 23, 24, 25]], np.int32)
    lmask = (left != 0).astype(np.int32)
    out_r = np.asarray(app.generate(jnp.asarray(right), jnp.asarray(rmask),
                                    max_length=6, jit_compile=False))
    out_l = np.asarray(app.generate(jnp.asarray(left), jnp.asarray(lmask),
                                    max_length=6, jit_compile=False))
    np.testing.assert_array_equal(out_r, out_l)
    # total buffer = prompt width + max_length new tokens
    assert out_r.shape == (2, 6 + 6)
    # generated region is non-pad until EOS for the unfinished rows
    assert out_r[:, 6:].any()
