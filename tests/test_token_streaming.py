"""Token streaming from the continuous batcher and over HTTP.

Contract: `submit(..., stream=True)` exposes the scheduler's committed
tokens incrementally via `handle.iter_tokens()`; the streamed sequence is
byte-identical to `handle.result()` (which stays usable after the stream
drains) and to a non-streaming submit of the same request — streaming is
an observation channel, never a semantics change. Failure paths terminate
the stream with the error instead of hanging the consumer.

Capability beyond the reference: its serving story is the commented-out
elastic predictor spec (reference easynlp/core/predictor.py:232-490) with
no incremental-token transport at all.
"""

import threading

import numpy as np
import pytest

from easynlp_tpu.serving import ContinuousBatcher

from tests.test_continuous_batching import _standalone_greedy, _tiny_model


@pytest.fixture(scope="module")
def batcher():
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=48,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=4)
    yield m, params, b
    b.stop()


def test_stream_matches_result_and_standalone(batcher):
    m, params, b = batcher
    rng = np.random.RandomState(7)
    prompt = rng.randint(1, 96, size=9).tolist()
    h = b.submit(prompt, max_new_tokens=11, stream=True)
    streamed = list(h.iter_tokens(timeout=120))
    assert streamed == h.result(timeout=1)  # already resolved
    assert streamed == _standalone_greedy(m, params, prompt, 11)


def test_concurrent_streams_are_isolated(batcher):
    """Two streams consumed from separate threads while sharing slots:
    each sees exactly its own request's tokens, in order."""
    m, params, b = batcher
    rng = np.random.RandomState(8)
    prompts = [rng.randint(1, 96, size=rng.randint(4, 12)).tolist()
               for _ in range(4)]
    handles = [b.submit(p, max_new_tokens=9, stream=True) for p in prompts]
    got = [None] * len(handles)

    def drain(i):
        got[i] = list(handles[i].iter_tokens(timeout=120))

    threads = [threading.Thread(target=drain, args=(i,))
               for i in range(len(handles))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    for i, p in enumerate(prompts):
        assert got[i] == _standalone_greedy(m, params, p, 9)


def test_sampled_stream_matches_nonstream_submit(batcher):
    """Streaming must not perturb the per-(prompt, seed) PRNG stream."""
    _, _, b = batcher
    rng = np.random.RandomState(9)
    prompt = rng.randint(1, 96, size=6).tolist()
    kw = dict(max_new_tokens=10, do_sample=True, temperature=0.8,
              top_k=7, seed=123)
    plain = b.submit(prompt, **kw).result(timeout=120)
    streamed = list(b.submit(prompt, stream=True, **kw)
                    .iter_tokens(timeout=120))
    assert streamed == plain


def test_iter_tokens_requires_stream_flag(batcher):
    _, _, b = batcher
    h = b.submit([1, 2, 3], max_new_tokens=2)
    h.result(timeout=120)
    with pytest.raises(ValueError, match="stream=True"):
        next(iter(h.iter_tokens()))


def test_stream_fails_fast_on_dead_scheduler():
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=48,
                          prompt_buckets=(16,), pad_token_id=0)
    b.stop()
    h = b.submit([1, 2, 3], max_new_tokens=4, stream=True)
    with pytest.raises(RuntimeError, match="generation failed"):
        list(h.iter_tokens(timeout=5))


def test_stream_terminates_with_error_on_mid_decode_stop():
    """stop() mid-generation must end the stream with the failure, not
    leave the consumer blocked: tokens already committed arrive first,
    then the iterator raises."""
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=256,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=2)
    h = b.submit([5, 6, 7], max_new_tokens=200, stream=True)
    it = h.iter_tokens(timeout=120)
    first = next(it)  # generation is live
    assert isinstance(first, int)
    b.stop()
    with pytest.raises(RuntimeError, match="generation failed"):
        for _ in it:
            pass
    # result() agrees with the stream's verdict
    with pytest.raises(RuntimeError):
        h.result(timeout=1)


# ---------------- cancellation / slot reclamation ----------------

def _wait_slots_free(b, deadline_s=60.0):
    import time
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        if all(o is None for o in b._occupants):
            return True
        time.sleep(0.02)
    return False


def test_cancel_mid_decode_frees_slot_and_resolves_partial():
    """cancel() retires the slot at the next scheduler iteration: the
    handle resolves cleanly with the tokens committed so far, and a
    follow-up request gets the slot (1-slot batcher)."""
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=1, max_length=256,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=2)
    try:
        h = b.submit([5, 6, 7], max_new_tokens=200, stream=True)
        it = h.iter_tokens(timeout=120)
        got = [next(it), next(it)]
        h.cancel()
        rest = list(it)  # stream ends cleanly, no error
        out = h.result(timeout=60)
        assert out[:2] == got and out == got + rest
        assert len(out) < 200  # actually stopped early
        assert _wait_slots_free(b)
        # the freed slot serves the next request normally
        follow = b.submit([9, 9, 2], max_new_tokens=7).result(timeout=120)
        assert follow == _standalone_greedy(m, params, [9, 9, 2], 7)
    finally:
        b.stop()


def test_cancel_while_queued_resolves_empty():
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=1, max_length=256,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=2)
    try:
        long_h = b.submit([1, 2, 3], max_new_tokens=200)
        queued = b.submit([4, 5, 6], max_new_tokens=50)
        queued.cancel()
        assert queued.result(timeout=60) == []  # never admitted
        long_h.cancel()
    finally:
        b.stop()


def test_http_client_disconnect_cancels_generation():
    """Dropping the streaming connection mid-generation frees the decode
    slot (the handler's write fails → generator close → handle.cancel)."""
    import http.client
    import json as _json

    from easynlp_tpu.serving import GenerationServer

    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=1, max_length=256,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=2)
    srv = GenerationServer(b, port=0).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=120)
        conn.request("POST", "/generate",
                     body=_json.dumps({"prompt_ids": [5, 6, 7],
                                       "max_new_tokens": 200,
                                       "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        resp.readline()  # generation is live
        conn.close()     # walk away mid-stream
        assert _wait_slots_free(b)
        # server stays alive and the slot serves the next request
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=120)
        conn.request("POST", "/generate",
                     body=_json.dumps({"prompt_ids": [9, 9, 2],
                                       "max_new_tokens": 7}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        body = _json.loads(resp.read())
        conn.close()
        assert body["output_ids"] == _standalone_greedy(m, params,
                                                        [9, 9, 2], 7)
    finally:
        srv.stop()


def test_cancel_before_admit_resolves_immediately():
    """cancel() of a still-QUEUED request resolves the handle right away —
    it must not wait for a slot to free (with every slot busy on a long
    generation there may be no admission opportunity for a long time)."""
    import time

    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=1, max_length=256,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=2)
    try:
        long_h = b.submit([1, 2, 3], max_new_tokens=200, stream=True)
        it = long_h.iter_tokens(timeout=120)
        next(it)  # the slot is definitely occupied now
        queued = b.submit([4, 5, 6], max_new_tokens=50, stream=True)
        t0 = time.monotonic()
        queued.cancel()
        out = queued.result(timeout=10)
        dt = time.monotonic() - t0
        assert out == []
        assert list(queued.iter_tokens(timeout=5)) == []  # clean stream end
        assert dt < 5.0, "queued cancel took %.1fs (waited for a slot?)" % dt
        assert not long_h.event.is_set()  # the occupant was untouched
        long_h.cancel()
    finally:
        b.stop()


def test_close_race_single_terminal_item():
    """Racing closers (scheduler _finish vs caller-side _fail_all) enqueue
    exactly ONE terminal stream item and agree on error-vs-clean."""
    from easynlp_tpu.serving.continuous import _STREAM_END, _Pending

    for trial in range(50):
        req = _Pending([1], 5, stream=True)
        err = RuntimeError("boom")
        barrier = threading.Barrier(2)

        def clean_close():
            barrier.wait()
            req.close()

        def err_close():
            barrier.wait()
            req.close(err)

        ts = [threading.Thread(target=clean_close),
              threading.Thread(target=err_close)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert req.stream_q.qsize() == 1
        item = req.stream_q.get_nowait()
        # whichever close won, the stream item and result() agree
        if req.error is None:
            assert item is _STREAM_END
            assert req.result(timeout=1) == []
        else:
            assert isinstance(item, BaseException)
            with pytest.raises(RuntimeError):
                req.result(timeout=1)
