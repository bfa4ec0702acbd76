"""Prompt-lookup speculative decoding: chunk-forward correctness (incl. the
bart/t5 intra-chunk causality paths) and token-exactness vs plain greedy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.modelzoo.generation_utils import (generate, greedy_or_sample,
                                                   left_pad)
from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
from easynlp_tpu.modelzoo.models.gpt2.generation import (
    make_gpt2_generation_fns)
from easynlp_tpu.modelzoo.speculative import (prompt_lookup_drafts,
                                              speculative_greedy)

GPT2_TINY = dict(vocab_size=97, n_positions=96, n_embd=32, n_layer=2,
                 n_head=2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
BART_TINY = dict(vocab_size=120, d_model=32, encoder_layers=2,
                 decoder_layers=2, encoder_attention_heads=4,
                 decoder_attention_heads=4, encoder_ffn_dim=64,
                 decoder_ffn_dim=64, max_position_embeddings=96, dropout=0.0,
                 attention_dropout=0.0, activation_dropout=0.0)
T5_TINY = dict(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_heads=4, dropout_rate=0.0)


def _tiny_gpt2(seed=0):
    cfg = GPT2Config(**GPT2_TINY)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(seed)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    return m, nn.unbox(params)


def _tiny_seq2seq(kind, seed=0):
    if kind == "bart":
        from easynlp_tpu.modelzoo.models.bart import (
            BartConfig, BartForConditionalGeneration)
        cfg = BartConfig(**BART_TINY)
        m = BartForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    else:
        from easynlp_tpu.modelzoo.models.t5 import (
            T5Config, T5ForConditionalGeneration)
        cfg = T5Config(**T5_TINY)
        m = T5ForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(seed)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 6), jnp.int32),
                    decoder_input_ids=jnp.ones((1, 3), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    return m, nn.unbox(params)


def test_prompt_lookup_drafts_copies_continuation():
    # buffer: [7 8 9 1 2 7 8 | ...], cur_len=7, bigram (7,8) matched at 0 →
    # drafts copy the tokens that followed: 9 1 2
    seqs = jnp.asarray([[7, 8, 9, 1, 2, 7, 8, 0, 0, 0]], jnp.int32)
    valid = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0, 0, 0]], jnp.int32)
    draft = np.asarray(prompt_lookup_drafts(seqs, valid, jnp.asarray(7), 3, 2))
    np.testing.assert_array_equal(draft, [[9, 1, 2]])

    # no earlier occurrence → pad drafts
    seqs2 = jnp.asarray([[3, 4, 5, 6, 0, 0]], jnp.int32)
    valid2 = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    draft2 = np.asarray(prompt_lookup_drafts(seqs2, valid2, jnp.asarray(4),
                                             2, 2, pad_token_id=0))
    np.testing.assert_array_equal(draft2, [[0, 0]])


def test_gpt2_chunk_decode_matches_sequential():
    """decode_chunk over S tokens must reproduce S sequential decode calls
    (positions, intra-chunk causality, cache writes)."""
    m, params = _tiny_gpt2()
    ids, mask = left_pad([[5, 6, 7, 8], [9, 10]], pad_token_id=0, length=5)
    prefill, decode = make_gpt2_generation_fns(m, max_length=24)
    _, cache_seq = prefill(params, jnp.asarray(ids), jnp.asarray(mask))
    _, cache_chunk = prefill(params, jnp.asarray(ids), jnp.asarray(mask))

    toks = np.random.RandomState(3).randint(1, 97, (2, 4)).astype(np.int32)
    seq_logits = []
    for i in range(4):
        lg, cache_seq = decode(params, jnp.asarray(toks[:, i:i + 1]),
                               cache_seq)
        seq_logits.append(np.asarray(lg))
    chunk_logits, cache_chunk = decode.chunk(params, jnp.asarray(toks),
                                             cache_chunk)
    chunk_logits = np.asarray(chunk_logits)
    for i in range(4):
        np.testing.assert_allclose(chunk_logits[:, i], seq_logits[i],
                                   atol=2e-4)
    # caches agree after the chunk
    np.testing.assert_allclose(np.asarray(cache_seq["k"]),
                               np.asarray(cache_chunk["k"]), atol=1e-5)
    assert int(cache_seq["index"]) == int(cache_chunk["index"])


@pytest.mark.parametrize("kind", ["bart", "t5"])
def test_seq2seq_chunk_decode_matches_sequential(kind):
    """Regression for the cached-decode intra-chunk causality fix: without
    the positional bias, later chunk tokens would attend to earlier logits'
    futures and the chunk would diverge from sequential decoding."""
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        make_encoder_decoder_fns)
    m, params = _tiny_seq2seq(kind)
    src = np.random.RandomState(0).randint(3, 120, (2, 7)).astype(np.int32)
    smask = np.ones((2, 7), np.int32)
    prefill, decode = make_encoder_decoder_fns(m, 24, jnp.asarray(src),
                                               jnp.asarray(smask))
    start = jnp.full((2, 1), 2, jnp.int32)
    sm = jnp.ones((2, 1), jnp.int32)
    _, st_seq = prefill(params, start, sm)
    _, st_chunk = prefill(params, start, sm)

    toks = np.random.RandomState(5).randint(3, 120, (2, 4)).astype(np.int32)
    seq_logits = []
    for i in range(4):
        lg, st_seq = decode(params, jnp.asarray(toks[:, i:i + 1]), st_seq)
        seq_logits.append(np.asarray(lg))
    chunk_logits, st_chunk = decode.chunk(params, jnp.asarray(toks), st_chunk)
    chunk_logits = np.asarray(chunk_logits)
    for i in range(4):
        np.testing.assert_allclose(chunk_logits[:, i], seq_logits[i],
                                   atol=3e-4)
    assert int(st_seq["index"]) == int(st_chunk["index"])


def _greedy_reference(m, params, pids, pmask, max_length, **kw):
    prefill, decode = make_gpt2_generation_fns(m, max_length)
    seqs, valid = greedy_or_sample(prefill, decode, params,
                                   jnp.asarray(pids), jnp.asarray(pmask),
                                   max_length, **kw)
    return np.asarray(seqs), np.asarray(valid)


def _speculative(m, params, pids, pmask, max_length, k=4, n=2, **kw):
    prefill, decode = make_gpt2_generation_fns(m, max_length,
                                               cache_slack=k + 1)
    seqs, valid, stats = speculative_greedy(
        prefill, decode.chunk, decode.rollback, params, jnp.asarray(pids),
        jnp.asarray(pmask), max_length, num_draft_tokens=k, ngram_size=n,
        **kw)
    return np.asarray(seqs), np.asarray(valid), stats


def test_gpt2_speculative_token_exact():
    m, params = _tiny_gpt2()
    # repetitive prompt (prompt lookup gets real matches) + irregular prompt
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [11, 23, 42]]
    pids, pmask = left_pad(prompts, pad_token_id=0, length=8)
    for kw in ({}, {"eos_token_id": 96}, {"min_length": 12,
                                          "eos_token_id": 96}):
        ref_seqs, ref_valid = _greedy_reference(m, params, pids, pmask, 32,
                                                pad_token_id=0, **kw)
        spec_seqs, spec_valid, _ = _speculative(m, params, pids, pmask, 32,
                                                pad_token_id=0, **kw)
        np.testing.assert_array_equal(spec_seqs, ref_seqs)
        np.testing.assert_array_equal(spec_valid, ref_valid)


def test_gpt2_speculative_accepts_drafts():
    """Tiny random LMs loop quickly, so the lookup must accept drafts on a
    self-repeating continuation; stats must reflect fewer verify rounds than
    generated tokens."""
    m, params = _tiny_gpt2()
    pids, pmask = left_pad([[5, 6, 7, 5, 6, 7, 5, 6]], pad_token_id=0,
                           length=8)
    _, _, stats = _speculative(m, params, pids, pmask, 48, k=6)
    accepted = int(stats["accepted_drafts"])
    rounds = int(stats["verify_rounds"])
    generated = int(stats["generated"])
    assert accepted > 0, (accepted, rounds, generated)
    assert rounds < generated


def test_generate_dispatch_speculative_and_fallback():
    m, params = _tiny_gpt2()
    pids, pmask = left_pad([[5, 6, 7, 5, 6, 7]], pad_token_id=0, length=6)
    prefill, decode = make_gpt2_generation_fns(m, 24, cache_slack=5)
    ref = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                              jnp.asarray(pmask), max_length=24,
                              pad_token_id=0))
    spec = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                               jnp.asarray(pmask), max_length=24,
                               pad_token_id=0, speculative="prompt_lookup",
                               num_draft_tokens=4))
    np.testing.assert_array_equal(spec, ref)
    # content-dependent processor → silent fallback to plain greedy
    fb = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                             jnp.asarray(pmask), max_length=24,
                             pad_token_id=0, speculative="prompt_lookup",
                             repetition_penalty=1.2))
    assert fb.shape == ref.shape


@pytest.mark.parametrize("kind", ["bart", "t5"])
def test_seq2seq_speculative_token_exact(kind):
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        encoder_decoder_generate)
    m, params = _tiny_seq2seq(kind)
    src = np.random.RandomState(1).randint(3, 120, (2, 8)).astype(np.int32)
    smask = np.ones((2, 8), np.int32)
    ref = np.asarray(encoder_decoder_generate(
        m, params, jnp.asarray(src), jnp.asarray(smask), max_length=24))
    spec = np.asarray(encoder_decoder_generate(
        m, params, jnp.asarray(src), jnp.asarray(smask), max_length=24,
        speculative="prompt_lookup", num_draft_tokens=4))
    np.testing.assert_array_equal(spec, ref)


def test_speculative_with_quantized_params():
    from easynlp_tpu.modelzoo.quantization import is_quantized, quantize_params
    m, params = _tiny_gpt2()
    q = quantize_params(params, min_size=512)
    assert is_quantized(q)
    pids, pmask = left_pad([[5, 6, 7, 5, 6, 7]], pad_token_id=0, length=6)
    seqs, valid, _ = _speculative(m, q, pids, pmask, 20, k=4)
    assert seqs.shape == (1, 20)
    assert (seqs >= 0).all() and (seqs < 97).all()


def test_pipeline_sequence_generation_speculative(tmp_path):
    """pipeline('sequence_generation', ckpt) honors the decode-parameter UDP
    contract from train_config.json (incl. speculative_decoding) — the
    --mode=serve path rides exactly this."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__),
                                      "fixtures"))
    from make_fixtures import make_bart_ckpt

    from easynlp_tpu.testing import make_args
    make_args()
    ckpt = make_bart_ckpt(
        str(tmp_path / "ck"),
        user_defined_parameters="max_decoder_length=12 num_beams=1 "
                                "speculative_decoding=prompt_lookup "
                                "num_draft_tokens=4")

    from easynlp_tpu.pipelines import pipeline
    pipe = pipeline("sequence_generation", ckpt, dtype=jnp.float32,
                    sequence_length=16, batch_size=2)
    assert pipe.predictor.speculative == "prompt_lookup"
    out = pipe(["the good day the good day", "a bad time"])
    assert len(out) == 2
    assert all("predictions" in r for r in out)


def _speculative_rowwise(m, params, pids, pmask, max_length, k=4, n=2, **kw):
    from easynlp_tpu.modelzoo.speculative import speculative_greedy_rowwise
    prefill, decode = make_gpt2_generation_fns(m, max_length,
                                               cache_slack=k + 1)
    seqs, valid, stats = speculative_greedy_rowwise(
        prefill, decode.chunk_rowwise, params, jnp.asarray(pids),
        jnp.asarray(pmask), max_length, num_draft_tokens=k, ngram_size=n,
        **kw)
    return np.asarray(seqs), np.asarray(valid), stats


def test_gpt2_rowwise_speculative_token_exact():
    """Per-row acceptance must stay token-exact vs plain greedy under the
    same processor configs as the batch-shared variant."""
    m, params = _tiny_gpt2()
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [11, 23, 42]]
    pids, pmask = left_pad(prompts, pad_token_id=0, length=8)
    for kw in ({}, {"eos_token_id": 96}, {"min_length": 12,
                                          "eos_token_id": 96}):
        ref_seqs, ref_valid = _greedy_reference(m, params, pids, pmask, 32,
                                                pad_token_id=0, **kw)
        row_seqs, row_valid, _ = _speculative_rowwise(
            m, params, pids, pmask, 32, pad_token_id=0, **kw)
        np.testing.assert_array_equal(row_seqs, ref_seqs)
        np.testing.assert_array_equal(row_valid, ref_valid)


def _fake_next_token_model(table, p, t, slack):
    """Deterministic 'model': next token = table[row, current_token]
    (one-hot logits), with a minimal dict cache carrying the index/mask
    bookkeeping both speculative engines rely on. Lets tests control the
    acceptance pattern per row exactly."""
    v = table.shape[1]
    table = jnp.asarray(table, jnp.int32)

    def prefill(params, ids, mask):
        b = ids.shape[0]
        cache_mask = jnp.zeros((b, t + slack), jnp.int32)
        cache_mask = jax.lax.dynamic_update_slice(cache_mask, mask, (0, 0))
        cache = {"index": jnp.asarray(p, jnp.int32), "mask": cache_mask}
        nxt = table[jnp.arange(b), ids[:, -1]]
        return jax.nn.one_hot(nxt, v), cache

    def chunk(params, tokens, cache):
        b, s = tokens.shape
        nxt = table[jnp.arange(b)[:, None], tokens]
        return jax.nn.one_hot(nxt, v), dict(cache,
                                            index=cache["index"] + s)

    def rollback(cache, drop):
        ni = cache["index"] - drop
        tlen = cache["mask"].shape[1]
        mask = jnp.where(jnp.arange(tlen)[None, :] >= ni, 0, cache["mask"])
        return dict(cache, index=ni, mask=mask)

    def chunk_rowwise(params, tokens, cache):
        b, s = tokens.shape
        nxt = table[jnp.arange(b)[:, None], tokens]
        return jax.nn.one_hot(nxt, v), dict(cache)

    return prefill, chunk, rollback, chunk_rowwise


def test_rowwise_not_dragged_by_short_matchless_row():
    """The failure mode BENCH_r04 measured (0.866x): with batch-shared
    min-acceptance, a row whose lookup never matches forces EVERY row to
    one token per verify round while it lives. Here row 1 is matchless
    (all bigrams distinct) but short (EOS after a few tokens) and row 0 is
    a clean 2-cycle: the shared engine crawls until row 1 dies and only
    then speeds up; the rowwise engine lets row 0 accept full drafts from
    round one — strictly fewer verify rounds for identical output."""
    from easynlp_tpu.modelzoo.speculative import (speculative_greedy,
                                                  speculative_greedy_rowwise)
    v, eos, p, t, k = 16, 15, 4, 40, 4
    table = np.zeros((2, v), np.int32)
    table[0, 1], table[0, 2] = 2, 1          # row 0: 1→2→1→... forever
    for tok in (3, 4, 5, 6, 7):              # row 1: 3→4→...→8→EOS
        table[1, tok] = tok + 1
    table[1, 8] = eos
    pids, pmask = left_pad([[1, 2, 1, 2], [3]], pad_token_id=0, length=p)
    prefill, chunk, rollback, chunk_row = _fake_next_token_model(
        table, p, t, slack=k + 1)

    s_seqs, s_valid, s_stats = speculative_greedy(
        prefill, chunk, rollback, None, jnp.asarray(pids),
        jnp.asarray(pmask), t, num_draft_tokens=k, ngram_size=2,
        eos_token_id=eos, pad_token_id=0)
    r_seqs, r_valid, r_stats = speculative_greedy_rowwise(
        prefill, chunk_row, None, jnp.asarray(pids), jnp.asarray(pmask),
        t, num_draft_tokens=k, ngram_size=2, eos_token_id=eos,
        pad_token_id=0)

    np.testing.assert_array_equal(r_seqs, s_seqs)
    np.testing.assert_array_equal(r_valid, s_valid)
    # row 1's output is exactly 4 5 6 7 8 EOS then pads
    row1 = r_seqs[1][p:]
    np.testing.assert_array_equal(row1[:6], [4, 5, 6, 7, 8, eos])
    assert int(r_stats["verify_rounds"]) < int(s_stats["verify_rounds"]), \
        (dict(r_stats), dict(s_stats))
    assert int(r_stats["accepted_drafts"]) > int(s_stats["accepted_drafts"])


def test_rowwise_speculative_with_quantized_params():
    from easynlp_tpu.modelzoo.quantization import (is_quantized,
                                                   quantize_params)
    m, params = _tiny_gpt2()
    q = quantize_params(params, min_size=512)
    assert is_quantized(q)
    pids, pmask = left_pad([[5, 6, 7, 5, 6, 7]], pad_token_id=0, length=6)
    ref_seqs, _ = _greedy_reference(m, q, pids, pmask, 20, pad_token_id=0)
    seqs, valid, _ = _speculative_rowwise(m, q, pids, pmask, 20, k=4)
    np.testing.assert_array_equal(seqs, ref_seqs)


def test_speculative_sampling():
    """Sampling under speculation: top_k=1 collapses to greedy exactly;
    general sampling is rng-deterministic and rng-sensitive."""
    m, params = _tiny_gpt2()
    pids, pmask = left_pad([[5, 6, 7, 5, 6, 7], [11, 23, 42]],
                           pad_token_id=0, length=6)
    prefill, decode = make_gpt2_generation_fns(m, 24, cache_slack=5)

    greedy = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                                 jnp.asarray(pmask), max_length=24,
                                 pad_token_id=0, speculative="prompt_lookup",
                                 num_draft_tokens=4))
    collapsed = np.asarray(generate(
        prefill, decode, params, jnp.asarray(pids), jnp.asarray(pmask),
        max_length=24, pad_token_id=0, speculative="prompt_lookup",
        num_draft_tokens=4, do_sample=True, top_k=1,
        rng=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(collapsed, greedy)

    def sample(seed):
        return np.asarray(generate(
            prefill, decode, params, jnp.asarray(pids), jnp.asarray(pmask),
            max_length=24, pad_token_id=0, speculative="prompt_lookup",
            num_draft_tokens=4, do_sample=True, temperature=1.3, top_k=50,
            rng=jax.random.PRNGKey(seed)))

    a, b, c = sample(0), sample(0), sample(1)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert (a >= 0).all() and (a < 97).all()
