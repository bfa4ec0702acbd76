"""Continuous batching (serving/continuous.py): slot joins/leaves mid-decode
with per-request outputs token-exact vs standalone greedy decoding."""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.modelzoo.generation_utils import greedy_or_sample, left_pad
from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
from easynlp_tpu.modelzoo.models.gpt2.generation import (
    make_gpt2_generation_fns)
from easynlp_tpu.serving.continuous import ContinuousBatcher

TINY = dict(vocab_size=97, n_positions=96, n_embd=32, n_layer=2, n_head=2,
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


def _standalone_greedy(m, params, prompt, n_new, eos=None):
    """Reference: plain greedy on the single prompt, same bucket padding the
    batcher uses (left-pad to 16)."""
    p = 16
    pids, pmask = left_pad([prompt], pad_token_id=0, length=p)
    prefill, decode = make_gpt2_generation_fns(m, p + n_new)
    kw = {} if eos is None else {"eos_token_id": eos}
    seqs, valid = greedy_or_sample(prefill, decode, params,
                                   jnp.asarray(pids), jnp.asarray(pmask),
                                   p + n_new, pad_token_id=0, **kw)
    seqs, valid = np.asarray(seqs)[0], np.asarray(valid)[0]
    out = [int(t) for t, v in zip(seqs[p:], valid[p:]) if v]
    # standalone stops writing after EOS; include it like the batcher does
    return out


def test_continuous_matches_standalone_greedy():
    m, params = _tiny_model()
    batcher = ContinuousBatcher(m, params, max_slots=3, max_length=48,
                                prompt_buckets=(16,), pad_token_id=0)
    try:
        prompts = [[5, 6, 7, 5, 6, 7], [11, 23, 42], [9, 10],
                   [50, 60, 70, 80], [3, 1, 4, 1, 5, 9, 2, 6]]
        n_new = [10, 7, 12, 5, 9]
        results = [None] * len(prompts)

        def fire(i):
            results[i] = batcher(prompts[i], max_new_tokens=n_new[i])

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, prompt in enumerate(prompts):
            ref = _standalone_greedy(m, params, prompt, n_new[i])[:n_new[i]]
            assert results[i] == ref, (i, results[i], ref)
    finally:
        batcher.stop()


def test_continuous_eos_and_slot_reuse():
    m, params = _tiny_model()
    # derive a token the model actually emits so EOS triggers organically
    probe = _standalone_greedy(m, params, [5, 6, 7], 6)
    eos = probe[3]
    batcher = ContinuousBatcher(m, params, max_slots=2, max_length=48,
                                prompt_buckets=(16,), eos_token_id=eos,
                                pad_token_id=0)
    try:
        # more requests than slots → slots must be reused as requests finish
        handles = [batcher.submit([5, 6, 7], max_new_tokens=20)
                   for _ in range(5)]
        outs = [h.result(timeout=300) for h in handles]
        ref = _standalone_greedy(m, params, [5, 6, 7], 20, eos=eos)
        ref_until_eos = probe[:4]  # tokens up to and including the eos
        for out in outs:
            assert out == ref_until_eos or out == ref, (out, ref_until_eos)
    finally:
        batcher.stop()


def test_scheduler_death_under_concurrent_load_fails_fast():
    """Round-4 stress drill: N threads of mixed-length requests, the
    scheduler dies mid-decode (poisoned _step). Every in-flight AND queued
    request must fail promptly (no caller hangs), no slot may leak, and
    post-crash submits must fail fast instead of blocking."""
    import time

    m, params = _tiny_model()
    batcher = ContinuousBatcher(m, params, max_slots=2, max_length=64,
                                prompt_buckets=(16,), pad_token_id=0)
    real_step = batcher._step
    calls = {"n": 0}

    def poisoned(params, state, active, remaining):
        calls["n"] += 1
        if calls["n"] > 2:   # let a couple of chunks decode, then die
            raise RuntimeError("injected scheduler death")
        return real_step(params, state, active, remaining)

    batcher._step = poisoned
    prompts = [[5, 6, 7], [11, 23, 42, 9], [9, 10], [50, 60],
               [3, 1, 4, 1, 5], [2, 7, 1, 8, 2, 8]]
    outcomes = [None] * len(prompts)

    def fire(i):
        t0 = time.time()
        try:
            # far more tokens than 2 chunks can produce -> mid-decode death
            batcher(prompts[i], max_new_tokens=40)
            outcomes[i] = ("ok", time.time() - t0)
        except RuntimeError:
            outcomes[i] = ("failed", time.time() - t0)

    threads = [threading.Thread(target=fire, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=90)
        assert not t.is_alive(), "caller hung after scheduler death"

    assert any(o[0] == "failed" for o in outcomes), outcomes
    for kind, dt in outcomes:
        assert dt < 60, "request neither finished nor failed fast"
    # slots must not leak occupants
    assert all(o is None for o in batcher._occupants)
    # post-crash submit fails immediately (no hang until result() timeout)
    import pytest as _pytest
    t0 = time.time()
    with _pytest.raises(RuntimeError):
        batcher.submit([1, 2, 3], max_new_tokens=4).result(timeout=5)
    assert time.time() - t0 < 5
    batcher._step = real_step
    batcher.stop()


def test_result_timeout_mid_decode_keeps_batcher_alive():
    """A caller timing out on .result() must not poison the batcher: the
    generation still completes, the same handle resolves afterwards, and
    fresh requests keep working."""
    m, params = _tiny_model()
    # chunk_size=1 -> many host round-trips, so a tiny timeout reliably
    # fires mid-decode
    batcher = ContinuousBatcher(m, params, max_slots=2, max_length=96,
                                prompt_buckets=(16,), pad_token_id=0,
                                chunk_size=1)
    try:
        req = batcher.submit([5, 6, 7, 5, 6, 7], max_new_tokens=60)
        import pytest as _pytest
        with _pytest.raises(TimeoutError):
            req.result(timeout=0.001)
        # the decode was unaffected: same handle resolves with the full,
        # token-exact sequence
        out = req.result(timeout=600)
        ref = _standalone_greedy(m, params, [5, 6, 7, 5, 6, 7], 60)[:60]
        assert out == ref
        # batcher still serves new requests after the timeout episode
        out2 = batcher([9, 10], max_new_tokens=5)
        ref2 = _standalone_greedy(m, params, [9, 10], 5)[:5]
        assert out2 == ref2
    finally:
        batcher.stop()


def test_device_decoder_matches_standalone_greedy():
    """DeviceContinuousDecoder (one while_loop for the whole workload) is
    token-exact vs standalone greedy: mixed prompt lengths, mixed budgets,
    more requests than slots (forces in-loop retirement + refill)."""
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder

    m, params = _tiny_model()
    dec = DeviceContinuousDecoder(m, params, max_slots=2, max_length=48,
                                  prompt_bucket=16, pad_token_id=0,
                                  chunk_size=3)
    prompts = [[5, 6, 7, 5, 6, 7], [11, 23, 42], [9, 10],
               [50, 60, 70, 80], [3, 1, 4, 1, 5, 9, 2, 6], [2, 7]]
    n_new = [10, 7, 12, 5, 9, 1]
    outs = dec(prompts, n_new)
    for i, prompt in enumerate(prompts):
        ref = _standalone_greedy(m, params, prompt, n_new[i])[:n_new[i]]
        assert outs[i] == ref, (i, outs[i], ref)


def test_device_decoder_eos_and_scalar_budget():
    """EOS retires a slot mid-chunk (trailing in-chunk tokens must not be
    emitted), the freed slot is refilled in-loop, and a scalar
    max_new_tokens broadcasts."""
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder

    m, params = _tiny_model()
    probe = _standalone_greedy(m, params, [5, 6, 7], 6)
    eos = probe[3]
    dec = DeviceContinuousDecoder(m, params, max_slots=2, max_length=48,
                                  prompt_bucket=16, eos_token_id=eos,
                                  pad_token_id=0, chunk_size=5)
    outs = dec([[5, 6, 7]] * 5, 20)
    ref = _standalone_greedy(m, params, [5, 6, 7], 20, eos=eos)
    ref_until_eos = probe[:4]  # up to and including the eos
    for out in outs:
        assert out == ref_until_eos or out == ref, (out, ref_until_eos)
    # empty workload and overlong prompt are handled explicitly
    assert dec([], 4) == []
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dec([list(range(17))], 4)
