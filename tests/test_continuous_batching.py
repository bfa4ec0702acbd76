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
