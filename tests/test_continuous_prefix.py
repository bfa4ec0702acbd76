"""Shared-prefix KV caching (serving/continuous.py shared_prefix): the
prefix is prefilled once, admits prefill only the per-request suffix, and
outputs are token-exact vs a prefix-less decoder run on prefix + suffix."""

import threading

import jax
import jax.numpy as jnp
import pytest

from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
from easynlp_tpu.serving.continuous import (ContinuousBatcher,
                                            DeviceContinuousDecoder)

TINY = dict(vocab_size=97, n_positions=96, n_embd=32, n_layer=2, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)

PREFIX = [7, 23, 42, 5, 61]
SUFFIXES = [[5, 6, 7, 5, 6], [11, 23, 42], [9], [50, 60, 70, 80],
            [3, 1, 4, 1, 5, 9], [2, 6, 2]]
BUDGETS = [10, 7, 12, 5, 9, 1]


def _tiny_model():
    cfg = GPT2Config(**TINY)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    return m, nn.unbox(params)


def _reference(m, params, budgets=BUDGETS, eos_token_id=None):
    """Prefix-less device decoder on the full prefix+suffix prompts."""
    ref = DeviceContinuousDecoder(
        m, params, max_slots=3, max_length=64,
        prompt_bucket=len(PREFIX) + 8, pad_token_id=0,
        eos_token_id=eos_token_id)
    return ref([PREFIX + s for s in SUFFIXES], budgets)


def test_device_decoder_prefix_greedy_token_exact():
    m, params = _tiny_model()
    want = _reference(m, params)
    dec = DeviceContinuousDecoder(
        m, params, max_slots=3, max_length=64, prompt_bucket=8,
        pad_token_id=0, shared_prefix=PREFIX)
    got = dec(SUFFIXES, BUDGETS)
    assert got == want


def test_device_decoder_prefix_with_eos():
    m, params = _tiny_model()
    # pick an EOS that actually occurs: use the first greedy token of the
    # longest-budget request so at least one request stops early
    probe = _reference(m, params)
    eos = probe[2][3]  # some generated token
    want = _reference(m, params, eos_token_id=eos)
    dec = DeviceContinuousDecoder(
        m, params, max_slots=3, max_length=64, prompt_bucket=8,
        pad_token_id=0, eos_token_id=eos, shared_prefix=PREFIX)
    got = dec(SUFFIXES, BUDGETS)
    assert got == want


def test_device_decoder_prefix_sampled_matches_full_prompt():
    m, params = _tiny_model()
    kw = dict(do_sample=[True, False, True, True, False, True],
              temperature=[0.9, 1.0, 1.3, 0.7, 1.0, 1.0],
              top_k=[0, 0, 5, 0, 0, 3],
              top_p=[1.0, 1.0, 1.0, 0.9, 1.0, 1.0],
              seed=[1, 2, 3, 4, 5, 6])
    ref = DeviceContinuousDecoder(
        m, params, max_slots=3, max_length=64,
        prompt_bucket=len(PREFIX) + 8, pad_token_id=0)
    want = ref([PREFIX + s for s in SUFFIXES], BUDGETS, **kw)
    dec = DeviceContinuousDecoder(
        m, params, max_slots=3, max_length=64, prompt_bucket=8,
        pad_token_id=0, shared_prefix=PREFIX)
    got = dec(SUFFIXES, BUDGETS, **kw)
    assert got == want


def test_device_decoder_prefix_speculative_token_exact():
    m, params = _tiny_model()
    want = _reference(m, params)
    dec = DeviceContinuousDecoder(
        m, params, max_slots=3, max_length=64, prompt_bucket=8,
        pad_token_id=0, shared_prefix=PREFIX, speculative=(2, 3))
    got = dec(SUFFIXES, BUDGETS)
    assert got == want
    assert dec.last_spec_stats["verify_rounds"] >= 1


def test_thread_batcher_prefix_token_exact():
    m, params = _tiny_model()
    want = _reference(m, params)
    batcher = ContinuousBatcher(
        m, params, max_slots=3, max_length=64, prompt_buckets=(8,),
        pad_token_id=0, shared_prefix=PREFIX)
    try:
        results = [None] * len(SUFFIXES)

        def fire(i):
            results[i] = batcher(SUFFIXES[i], max_new_tokens=BUDGETS[i])

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(SUFFIXES))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert results == want
    finally:
        batcher.stop()


def test_prefix_validation():
    m, params = _tiny_model()
    dec = DeviceContinuousDecoder(
        m, params, max_slots=2, max_length=32, prompt_bucket=8,
        pad_token_id=0, shared_prefix=PREFIX)
    with pytest.raises(ValueError):
        dec([[]], 4)  # empty suffix has no position to read logits from
    with pytest.raises(AssertionError):
        DeviceContinuousDecoder(m, params, max_slots=2, max_length=12,
                                prompt_bucket=8, shared_prefix=PREFIX)
