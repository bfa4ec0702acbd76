"""GenerationServer: HTTP /generate over the ContinuousBatcher.

Contract: token-id requests join the shared continuous decode loop; each
response equals what the batcher (and, for sampled requests, the
DeviceContinuousDecoder) produces for the same (prompt, params) — HTTP is
a pure transport, adding no batching semantics of its own. Capability
beyond the reference: its serving story is the commented-out elastic
predictor spec (reference easynlp/core/predictor.py:232-490)."""

import numpy as np
import pytest

from tests.test_continuous_batching import _standalone_greedy, _tiny_model
from tests.test_serving import _get, _post


@pytest.fixture(scope="module")
def gen_server():
    from easynlp_tpu.serving import ContinuousBatcher, GenerationServer
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=48,
                          prompt_buckets=(16,), pad_token_id=0, chunk_size=4)
    srv = GenerationServer(b, port=0, default_max_new_tokens=8).start()
    yield m, params, srv
    srv.stop()


def test_single_greedy_matches_standalone(gen_server):
    m, params, srv = gen_server
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 96, size=7).tolist()
    status, body = _post(srv.port, {"prompt_ids": prompt,
                                    "max_new_tokens": 10},
                         path="/generate")
    assert status == 200, body
    assert body["output_ids"] == _standalone_greedy(m, params, prompt, 10)


def test_batch_mixed_sampling_matches_device_decoder(gen_server):
    """Mixed greedy/sampled batch over HTTP == DeviceContinuousDecoder for
    the same requests: the per-(prompt, seed) PRNG stream survives the
    transport + continuous-batching path."""
    from easynlp_tpu.serving import DeviceContinuousDecoder
    m, params, srv = gen_server
    rng = np.random.RandomState(1)
    prompts = [rng.randint(1, 96, size=rng.randint(3, 10)).tolist()
               for _ in range(5)]
    payload = {
        "prompts": prompts,
        "max_new_tokens": 12,
        "do_sample": [False, True, True, False, True],
        "temperature": [1.0, 0.7, 1.3, 1.0, 0.9],
        "top_k": [0, 5, 0, 0, 3],
        "top_p": [1.0, 1.0, 0.9, 1.0, 0.95],
        "seed": [0, 11, 22, 33, 44],
    }
    status, body = _post(srv.port, payload, path="/generate")
    assert status == 200, body
    dec = DeviceContinuousDecoder(m, params, max_slots=2, max_length=48,
                                  prompt_bucket=16, pad_token_id=0,
                                  chunk_size=4)
    want = dec(prompts, max_new_tokens=12, do_sample=payload["do_sample"],
               temperature=payload["temperature"], top_k=payload["top_k"],
               top_p=payload["top_p"], seed=payload["seed"])
    assert body["outputs"] == want


def test_bad_requests_are_400_and_server_survives(gen_server):
    m, params, srv = gen_server
    # prompt over the largest bucket → 400 (batcher's fail-loud contract)
    status, body = _post(srv.port, {"prompt_ids": list(range(1, 30))},
                         path="/generate")
    assert status == 400 and "bucket" in body["error"]
    # no prompt at all
    status, body = _post(srv.port, {"max_new_tokens": 4}, path="/generate")
    assert status == 400
    # text without a tokenizer
    status, body = _post(srv.port, {"text": "hi"}, path="/generate")
    assert status == 400 and "tokenizer" in body["error"]
    # per-request list of the wrong length
    status, body = _post(srv.port, {"prompts": [[1, 2], [3, 4]],
                                    "seed": [1]}, path="/generate")
    assert status == 400 and "entries" in body["error"]
    # unknown path → 404
    status, body = _post(srv.port, {"prompt_ids": [1]}, path="/nope")
    assert status == 404
    # server still generates fine
    status, body = _post(srv.port, {"prompt_ids": [5, 6, 7]},
                         path="/generate")
    assert status == 200
    assert body["output_ids"] == _standalone_greedy(m, params, [5, 6, 7], 8)


def test_info_and_health(gen_server):
    _, _, srv = gen_server
    status, body = _get(srv.port, "/health")
    assert status == 200 and body["status"] == "ok"
    status, body = _get(srv.port, "/info")
    assert status == 200
    assert body["slots"] == 2 and body["prompt_buckets"] == [16]
    assert body["stats"]["requests"] >= 1


def test_tokenizer_text_roundtrip():
    """With a tokenizer attached, text in → ids → decode loop → text out."""
    from easynlp_tpu.serving import ContinuousBatcher, GenerationServer

    class _Tok:
        def encode(self, s):
            return [ord(c) % 90 + 1 for c in s]

        def decode(self, ids):
            return "".join(chr(i + 60) for i in ids)

    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=32,
                          prompt_buckets=(16,), pad_token_id=0, chunk_size=4)
    srv = GenerationServer(b, port=0, tokenizer=_Tok(),
                           default_max_new_tokens=5).start()
    try:
        status, body = _post(srv.port, {"text": "hello"}, path="/generate")
        assert status == 200, body
        want = _standalone_greedy(m, params, _Tok().encode("hello"), 5)
        assert body["output_ids"] == want
        assert body["text"] == _Tok().decode(want)
    finally:
        srv.stop()


def test_cli_serve_continuous(tmp_path):
    """--mode=serve + serve_continuous=true: checkpoint-dir → AutoModel →
    ContinuousBatcher → GenerationServer, all through the CLI main."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__),
                                      "fixtures"))
    from make_fixtures import make_gpt2_ckpt

    from easynlp_tpu.appzoo.api import default_main_fn
    from easynlp_tpu.testing import make_args

    ckpt = make_gpt2_ckpt(str(tmp_path / "gptck"))
    args = make_args(
        mode="serve", checkpoint_dir=ckpt, sequence_length=48,
        user_defined_parameters_dict={
            "serve_continuous": "true", "serve_blocking": "False",
            "serve_port": 0, "serve_slots": 2, "serve_chunk_size": 4,
            "serve_prompt_buckets": "16", "serve_max_new_tokens": 6,
        })
    srv = default_main_fn(args)
    try:
        status, body = _get(srv.port, "/info")
        assert status == 200 and body["mode"] == "continuous"
        assert body["slots"] == 2 and body["max_length"] == 48
        # text in/out through the checkpoint's own BPE tokenizer
        status, body = _post(srv.port, {"text": "ab", "do_sample": True,
                                        "temperature": 0.8, "seed": 3},
                             path="/generate")
        assert status == 200, body
        assert isinstance(body["text"], str)
        # same (prompt, seed) → same sampled tokens, co-tenant-independent
        status2, body2 = _post(srv.port, {"text": "ab", "do_sample": True,
                                          "temperature": 0.8, "seed": 3},
                               path="/generate")
        assert body2["output_ids"] == body["output_ids"]
        # streamed text request: text_deltas concatenate to the final text
        # and the token stream equals the non-streaming output
        status3, events = _post_stream(srv.port, {"text": "ab",
                                                  "do_sample": True,
                                                  "temperature": 0.8,
                                                  "seed": 3,
                                                  "stream": True})
        assert status3 == 200, events
        done = events[-1]
        assert done["output_ids"] == body["output_ids"]
        # delta protocol: concatenated deltas (incl. the done event's
        # held-back tail, if any) reconstruct the final text exactly
        assert "".join(e.get("text_delta", "")
                       for e in events) == done["text"]
    finally:
        srv.stop()


def test_dead_batcher_is_503():
    from easynlp_tpu.serving import ContinuousBatcher, GenerationServer
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=32,
                          prompt_buckets=(16,), pad_token_id=0, chunk_size=4)
    srv = GenerationServer(b, port=0).start()
    try:
        b.stop()  # scheduler gone: submits fail fast → 503 per contract
        status, body = _post(srv.port, {"prompt_ids": [1, 2]},
                             path="/generate")
        assert status == 503, (status, body)
    finally:
        srv.stop(stop_batcher=False)


# ---------------- token streaming over HTTP ----------------

def _post_stream(port, payload):
    """POST /generate with stream=true; returns (status, events) where
    events are parsed NDJSON lines read incrementally off the chunked
    response (http.client decodes the chunk framing)."""
    import http.client
    import json as _json
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    try:
        conn.request("POST", "/generate", body=_json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        if resp.status != 200:
            return resp.status, _json.loads(resp.read())
        assert resp.getheader("Content-Type") == "application/x-ndjson"
        events = []
        while True:
            line = resp.readline()
            if not line:
                break
            events.append(_json.loads(line))
        return resp.status, events
    finally:
        conn.close()


def test_http_stream_matches_nonstream(gen_server):
    m, params, srv = gen_server
    rng = np.random.RandomState(5)
    prompt = rng.randint(1, 96, size=8).tolist()
    status, body = _post(srv.port, {"prompt_ids": prompt,
                                    "max_new_tokens": 9},
                         path="/generate")
    assert status == 200, body
    status, events = _post_stream(srv.port, {"prompt_ids": prompt,
                                             "max_new_tokens": 9,
                                             "stream": True})
    assert status == 200, events
    toks = [e["token"] for e in events[:-1]]
    done = events[-1]
    assert done.get("done") is True
    assert toks == done["output_ids"] == body["output_ids"]
    assert toks == _standalone_greedy(m, params, prompt, 9)


def test_http_stream_per_request_sampling(gen_server):
    """A sampled stream reproduces the non-streaming sampled output for
    the same (prompt, seed) — the transport doesn't perturb the PRNG."""
    _, _, srv = gen_server
    req = {"prompt_ids": [3, 1, 4, 1, 5], "max_new_tokens": 8,
           "do_sample": True, "temperature": 0.9, "top_k": 5, "seed": 42}
    status, body = _post(srv.port, req, path="/generate")
    assert status == 200, body
    status, events = _post_stream(srv.port, dict(req, stream=True))
    assert status == 200, events
    assert events[-1]["output_ids"] == body["output_ids"]


def test_http_stream_rejects_batch(gen_server):
    _, _, srv = gen_server
    status, body = _post_stream(srv.port, {"prompts": [[1, 2], [3, 4]],
                                           "stream": True})
    assert status == 400
    assert "single prompt" in body["error"]


def test_http_stream_dead_batcher_is_503():
    from easynlp_tpu.serving import ContinuousBatcher, GenerationServer
    m, params = _tiny_model()
    b = ContinuousBatcher(m, params, max_slots=2, max_length=32,
                          prompt_buckets=(16,), pad_token_id=0, chunk_size=4)
    srv = GenerationServer(b, port=0).start()
    try:
        b.stop()
        status, body = _post_stream(srv.port, {"prompt_ids": [1, 2],
                                               "stream": True})
        assert status == 503, (status, body)
    finally:
        srv.stop(stop_batcher=False)


class _PairTokenizer:
    """Byte-fallback-style decode: tokens pair up into characters; an odd
    trailing token is an INCOMPLETE character and decodes to U+FFFD —
    the shape of SentencePiece byte-fallback mid-multibyte-char."""

    def decode(self, toks):
        out = []
        for i in range(0, len(toks) - 1, 2):
            out.append(chr(0x4E00 + (toks[i] * 97 + toks[i + 1]) % 500))
        if len(toks) % 2:
            out.append("�")
        return "".join(out)


def test_stream_deltas_hold_back_incomplete_chars(gen_server):
    """text_delta never bakes in a U+FFFD from an incomplete multi-piece
    character: the tail is held back until completed, concatenated deltas
    equal the final text, and the done event is the authoritative decode."""
    from easynlp_tpu.serving import GenerationServer
    _, _, srv0 = gen_server
    srv = GenerationServer(srv0.batcher, port=0, tokenizer=_PairTokenizer(),
                           default_max_new_tokens=9)  # odd: genuine U+FFFD tail
    events = list(srv._stream_events({"prompt_ids": [3, 1, 4]}))
    done = events[-1]
    assert done["done"] is True
    deltas = [e.get("text_delta", "") for e in events]
    assert "".join(deltas) == done["text"]
    # no NON-TERMINAL delta may contain the replacement char; the genuine
    # trailing U+FFFD (odd token count) lands only in the final event
    assert all("�" not in d for d in deltas[:-1])
    assert done["text"] == _PairTokenizer().decode(done["output_ids"])
    assert len(done["output_ids"]) == 9


class _RewritingTokenizer:
    """decode() REWRITES earlier characters once enough tokens arrive (the
    general non-append case the delta protocol must survive)."""

    def decode(self, toks):
        s = "".join(chr(97 + t % 26) for t in toks)
        return s.upper() if len(toks) >= 4 else s


def test_stream_rewrite_resyncs_with_replace_event(gen_server):
    from easynlp_tpu.serving import GenerationServer
    _, _, srv0 = gen_server
    srv = GenerationServer(srv0.batcher, port=0,
                           tokenizer=_RewritingTokenizer(),
                           default_max_new_tokens=8)
    events = list(srv._stream_events({"prompt_ids": [3, 1, 4]}))
    done = events[-1]
    # replay the client-side protocol: deltas append, replace resets
    text = ""
    for e in events[:-1]:
        if e.get("replace"):
            text = e["text"]
        else:
            text += e.get("text_delta", "")
    text += done.get("text_delta", "")
    assert any(e.get("replace") for e in events[:-1])  # rewrite happened
    assert text == done["text"]
    assert done["text"] == _RewritingTokenizer().decode(done["output_ids"])


def test_blocking_timeout_is_503(gen_server):
    """A blocking-request TimeoutError maps to 503 on the non-streaming
    path, matching the streaming path (TimeoutError subclasses OSError,
    not RuntimeError — it needs its own except clause)."""
    from easynlp_tpu.serving import GenerationServer
    _, _, srv0 = gen_server
    srv = GenerationServer(srv0.batcher, port=0,
                           request_timeout_s=0.0).start()
    try:
        status, body = _post(srv.port, {"prompt_ids": [1, 2],
                                        "max_new_tokens": 64},
                             path="/generate")
        assert status == 503, (status, body)
        assert "error" in body
    finally:
        srv.stop(stop_batcher=False)
