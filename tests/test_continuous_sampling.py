"""Per-request sampling in the continuous-batching paths.

The contract under test: a request's sampled tokens are a pure function of
(prompt, seed) — token n draws from fold_in(PRNGKey(seed), n) over logits
warped by the request's own temperature/top_k/top_p — so outputs are
independent of slot assignment, chunk boundaries, co-tenant requests, and
of WHICH implementation runs the request (ContinuousBatcher vs
DeviceContinuousDecoder). Capability beyond the reference: its serving
story has no shared decode loop at all (ref easynlp/core/predictor.py:232
commented-out elastic spec)."""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.modelzoo.generation_utils import (apply_temperature,
                                                   apply_top_k, apply_top_p,
                                                   rowwise_warp_and_sample)
from easynlp_tpu.serving.continuous import (ContinuousBatcher,
                                            DeviceContinuousDecoder)
from tests.test_continuous_batching import _standalone_greedy, _tiny_model


def _ref_row_sample(row, temp, k, p, seed, pos):
    """Scalar-helper reference for one row: same warp order the engine
    uses (temperature -> top_k -> top_p), same per-request key."""
    warped = apply_temperature(row[None, :].astype(jnp.float32), temp)
    warped = apply_top_k(warped, k)
    warped = apply_top_p(warped, p)
    key = jax.random.fold_in(jax.random.PRNGKey(np.uint32(seed)), pos)
    return int(jax.random.categorical(key, warped[0]))


def test_rowwise_warp_matches_scalar_helpers():
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(6, 50).astype(np.float32) * 3)
    temps = [1.0, 0.7, 1.3, 0.5, 2.0, 0.9]
    ks = [0, 5, 1, 50, 3, 17]
    ps = [1.0, 0.9, 0.5, 0.3, 1.0, 0.8]
    seeds = [0, 1, 2, 3, 4, 12345]
    poss = [0, 1, 7, 2, 9, 0]
    got = rowwise_warp_and_sample(
        logits, jnp.ones(6, bool), jnp.asarray(temps, jnp.float32),
        jnp.asarray(ks, jnp.int32), jnp.asarray(ps, jnp.float32),
        jnp.asarray(seeds, jnp.uint32), jnp.asarray(poss, jnp.int32))
    got = np.asarray(got)
    for i in range(6):
        want = _ref_row_sample(logits[i], temps[i], ks[i], ps[i],
                               seeds[i], poss[i])
        assert got[i] == want, (i, got[i], want)


def test_rowwise_greedy_rows_are_argmax():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(4, 31).astype(np.float32))
    ds = jnp.asarray([False, True, False, True])
    got = np.asarray(rowwise_warp_and_sample(
        logits, ds, jnp.full(4, 5.0, jnp.float32),
        jnp.zeros(4, jnp.int32), jnp.ones(4, jnp.float32),
        jnp.arange(4, dtype=jnp.uint32), jnp.zeros(4, jnp.int32)))
    argmax = np.asarray(jnp.argmax(logits, -1))
    assert got[0] == argmax[0] and got[2] == argmax[2]
    # top_k=1 forces the sampled rows to argmax too
    got_k1 = np.asarray(rowwise_warp_and_sample(
        logits, jnp.ones(4, bool), jnp.ones(4, jnp.float32),
        jnp.ones(4, jnp.int32), jnp.ones(4, jnp.float32),
        jnp.arange(4, dtype=jnp.uint32), jnp.zeros(4, jnp.int32)))
    np.testing.assert_array_equal(got_k1, argmax)


def _mixed_workload():
    """(prompt, n_new, decode_kwargs) covering greedy + heterogeneous
    sampling configs in one shared batch."""
    return [
        ([5, 6, 7, 5, 6, 7], 9, {}),
        ([11, 23, 42], 7, dict(do_sample=True, temperature=1.3, seed=11)),
        ([9, 10], 12, dict(do_sample=True, top_k=5, seed=2)),
        ([50, 60, 70, 80], 5, dict(do_sample=True, top_p=0.8,
                                   temperature=0.9, seed=33)),
        ([3, 1, 4, 1, 5, 9], 10, dict(do_sample=True, temperature=2.0,
                                      top_k=20, top_p=0.95, seed=4)),
        ([2, 7, 2, 7], 8, {}),
    ]


def test_batcher_sampling_deterministic_across_cotenants():
    """Same (prompt, seed) twice, in batches with different co-tenants and
    slot layouts -> identical tokens; different seed -> different tokens."""
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=48,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=3)
    try:
        kw = dict(do_sample=True, temperature=1.5, top_k=0, top_p=1.0)
        first = b.submit([11, 23, 42], max_new_tokens=10, seed=7, **kw)
        other = b.submit([9, 10, 9, 10], max_new_tokens=4, **kw, seed=1)
        a1 = first.result(timeout=300)
        other.result(timeout=300)
        # resubmit among different neighbours
        h1 = b.submit([11, 23, 42], max_new_tokens=10, seed=7, **kw)
        h2 = b.submit([5, 6, 7], max_new_tokens=10)  # greedy co-tenant
        a2 = h1.result(timeout=300)
        h2.result(timeout=300)
        assert a1 == a2
        h3 = b.submit([11, 23, 42], max_new_tokens=10, seed=8, **kw)
        a3 = h3.result(timeout=300)
        assert a3 != a1  # 10 draws at temp 1.5: collision ~ impossible
    finally:
        b.stop()


def test_device_decoder_matches_batcher_and_greedy():
    """The full mixed workload through both implementations, with DIFFERENT
    chunk sizes and slot counts: sampled requests must agree token-for-token
    (shared per-request PRNG streams), greedy requests must equal standalone
    greedy decoding."""
    m, params = _tiny_model()
    work = _mixed_workload()
    b = ContinuousBatcher(m, params, max_slots=3, max_length=48,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=4)
    try:
        handles = [b.submit(ids, max_new_tokens=n, **kw)
                   for ids, n, kw in work]
        got_b = [h.result(timeout=600) for h in handles]
    finally:
        b.stop()

    dec = DeviceContinuousDecoder(m, params, max_slots=2, max_length=48,
                                  prompt_bucket=16, pad_token_id=0,
                                  chunk_size=5)
    got_d = dec([ids for ids, _, _ in work],
                [n for _, n, _ in work],
                do_sample=[kw.get("do_sample", False) for _, _, kw in work],
                temperature=[kw.get("temperature", 1.0)
                             for _, _, kw in work],
                top_k=[kw.get("top_k", 0) for _, _, kw in work],
                top_p=[kw.get("top_p", 1.0) for _, _, kw in work],
                seed=[kw.get("seed", 0) for _, _, kw in work])

    for i, (ids, n, kw) in enumerate(work):
        assert got_b[i] == got_d[i], (i, got_b[i], got_d[i])
        assert len(got_b[i]) == n
        if not kw.get("do_sample"):
            assert got_b[i] == _standalone_greedy(m, params, ids, n)
