"""Speculative decoding inside the device-resident continuous decoder.

Contract: with `speculative=(ngram, K)` the DeviceContinuousDecoder's
outputs are TOKEN-EXACT vs the non-speculative decoder (and therefore vs
standalone greedy) for every request — acceptance only changes how many
verify forwards the stream costs, never its content. Capability beyond
the reference (its generation is strictly one-token-per-forward,
reference easynlp/modelzoo/generation_utils.py:644) and beyond round-3's
standalone speculative engine: drafts are proposed and verified INSIDE
the slot loop, so mixed-length continuous workloads keep slot refill AND
multi-token commits."""

import numpy as np
import pytest

from tests.test_continuous_batching import _tiny_model


def _decoders(spec=(2, 4), slots=2, max_length=64, bucket=16, eos=None):
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    m, params = _tiny_model()
    plain = DeviceContinuousDecoder(m, params, max_slots=slots,
                                    max_length=max_length,
                                    prompt_bucket=bucket, pad_token_id=0,
                                    eos_token_id=eos, chunk_size=4)
    spec_dec = DeviceContinuousDecoder(m, params, max_slots=slots,
                                       max_length=max_length,
                                       prompt_bucket=bucket, pad_token_id=0,
                                       eos_token_id=eos, speculative=spec)
    return plain, spec_dec


def _repetitive_prompts(n, rng):
    """Copy-heavy prompts (repeated motifs) so prompt lookup actually
    accepts drafts — plus a couple of random rows for the 0-acceptance
    path."""
    prompts = []
    for i in range(n):
        if i % 3 == 2:
            prompts.append(rng.randint(1, 96, size=rng.randint(4, 10))
                           .tolist())
        else:
            motif = rng.randint(1, 96, size=3).tolist()
            prompts.append((motif * 4)[:rng.randint(8, 13)])
    return prompts


def test_speculative_is_token_exact_mixed_lengths():
    rng = np.random.RandomState(0)
    plain, spec = _decoders()
    prompts = _repetitive_prompts(7, rng)
    budgets = [17, 5, 23, 1, 9, 30, 12]
    want = plain(prompts, max_new_tokens=budgets)
    got = spec(prompts, max_new_tokens=budgets)
    assert got == want
    stats = spec.last_spec_stats
    assert stats is not None and stats["verify_rounds"] >= 1
    # on the copy-heavy rows the drafts must actually accept: fewer verify
    # rounds than tokens committed in rounds
    assert stats["tokens_committed_in_rounds"] > stats["verify_rounds"]


def test_speculative_eos_mid_chunk():
    """An EOS produced inside an accepted draft prefix must truncate the
    commit exactly where the sequential loop would stop."""
    rng = np.random.RandomState(1)
    # find the eos organically: run plain greedy, pick a token that shows
    # up mid-stream, then re-run both decoders with that token as EOS
    plain0, _ = _decoders()
    prompts = _repetitive_prompts(4, rng)
    base = plain0(prompts, max_new_tokens=20)
    eos = base[0][len(base[0]) // 2]
    plain, spec = _decoders(eos=eos)
    want = plain(prompts, max_new_tokens=20)
    got = spec(prompts, max_new_tokens=20)
    assert got == want
    assert any(o and o[-1] == eos for o in want)  # EOS path exercised


def test_speculative_zero_acceptance_random_prompts():
    """Random prompts (no repeated n-grams): lookup drafts pad repeats,
    acceptance ~0, output still exact — one committed token per round."""
    rng = np.random.RandomState(3)
    plain, spec = _decoders()
    prompts = [rng.randint(1, 96, size=rng.randint(3, 9)).tolist()
               for _ in range(4)]
    want = plain(prompts, max_new_tokens=10)
    got = spec(prompts, max_new_tokens=10)
    assert got == want


def test_speculative_falls_back_for_sampling():
    """A call with any sampled request routes to the non-speculative build
    (per-request PRNG streams are position-keyed; speculation would change
    realization)."""
    rng = np.random.RandomState(5)
    plain, spec = _decoders()
    prompts = _repetitive_prompts(3, rng)
    kw = dict(max_new_tokens=8, do_sample=[False, True, False],
              temperature=0.8, seed=[0, 7, 0])
    want = plain(prompts, **kw)
    got = spec(prompts, **kw)
    assert got == want
    assert spec.last_spec_stats is None  # non-spec path taken


def test_speculative_window_edge_provisioning():
    """Constructor rejects a bucket too close to the KV window for K+1
    verify entries."""
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    m, params = _tiny_model()
    with pytest.raises(AssertionError):
        DeviceContinuousDecoder(m, params, max_slots=2, max_length=20,
                                prompt_bucket=16, speculative=(2, 4))
