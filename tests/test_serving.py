"""HTTP serving: dynamic micro-batching server over pipeline()
(easynlp_tpu/serving — TPU-native online-serving counterpart of the
reference's commented-out elastic predictor spec,
reference easynlp/core/predictor.py:232-490)."""

import json
import os
import subprocess
import sys
import threading
import urllib.request

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _post(port, payload, path="/predict"):
    req = urllib.request.Request(
        "http://127.0.0.1:%d%s" % (port, path),
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(
            "http://127.0.0.1:%d%s" % (port, path), timeout=10) as r:
        return r.status, json.loads(r.read())


def test_batching_coalesces_concurrent_requests():
    from easynlp_tpu.serving import PredictionServer

    batch_sizes = []

    def fake_pipeline(inputs):
        batch_sizes.append(len(inputs))
        return [{"echo": x} for x in inputs]

    srv = PredictionServer(fake_pipeline, port=0, max_batch_size=16,
                           max_delay_ms=150).start()
    try:
        status, health = _get(srv.port, "/health")
        assert status == 200 and health["status"] == "ok"

        results = [None] * 8

        def fire(i):
            results[i] = _post(srv.port, {"inputs": ["req-%d" % i]})

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (status, body) in enumerate(results):
            assert status == 200
            assert body["outputs"] == [{"echo": "req-%d" % i}]
        # 8 concurrent singleton requests → strictly fewer device batches
        assert sum(batch_sizes) == 8
        assert len(batch_sizes) < 8

        status, info = _get(srv.port, "/info")
        assert info["stats"]["examples"] == 8
    finally:
        srv.stop()


def test_single_input_and_errors_keep_server_alive():
    from easynlp_tpu.serving import PredictionServer

    def flaky(inputs):
        if any(x == "boom" for x in inputs):
            raise ValueError("bad input")
        return [x.upper() for x in inputs]

    srv = PredictionServer(flaky, port=0, max_batch_size=4,
                           max_delay_ms=1).start()
    try:
        status, body = _post(srv.port, {"input": "hello"})
        assert status == 200 and body["output"] == "HELLO"

        status, body = _post(srv.port, {"input": "boom"})
        assert status == 500 and "bad input" in body["error"]

        # server still serves after a failed batch
        status, body = _post(srv.port, {"inputs": ["ok"]})
        assert status == 200 and body["outputs"] == ["OK"]

        status, body = _post(srv.port, {})
        assert status == 400
    finally:
        srv.stop()


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_e2e")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
    from make_fixtures import build_all
    build_all(str(d))
    ckpt = os.path.join(str(d), "ckpt")
    env = dict(os.environ, EASYNLP_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/easynlp_tpu_jax_cache",
               PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, "-m", "easynlp_tpu.cli", "--mode=train",
         "--app_name=text_classify",
         "--tables=%s/train.tsv,%s/dev.tsv" % (d, d),
         "--input_schema=sid:str:1,sent:str:1,label:str:1",
         "--first_sequence=sent", "--label_name=label",
         "--checkpoint_dir=" + ckpt, "--epoch_num=1",
         "--micro_batch_size=8", "--sequence_length=16",
         "--user_defined_parameters=pretrain_model_name_or_path=%s/tiny-bert"
         % d],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    return ckpt


def test_serve_trained_checkpoint(trained_ckpt):
    """mode=serve path end-to-end: pipeline(ckpt) behind HTTP."""
    from easynlp_tpu.serving import serve

    srv = serve(trained_ckpt, port=0, max_batch_size=8, max_delay_ms=20,
                blocking=False, first_sequence="sent",
                sequence_length=16, batch_size=8)
    try:
        status, body = _post(
            srv.port,
            {"inputs": ["a good happy day", "an awful sad story"]})
        assert status == 200, body
        outs = body["outputs"]
        assert len(outs) == 2
        for out in outs:
            assert out["predictions"] in ("pos", "neg")
    finally:
        srv.stop()


def test_export_mode(trained_ckpt):
    """--mode=export writes a torch-loadable backbone checkpoint
    (reference utils/exporter.py:81-193 analogue)."""
    env = dict(os.environ, EASYNLP_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/easynlp_tpu_jax_cache",
               PYTHONPATH=REPO)
    out = os.path.join(trained_ckpt, "exported.bin")
    res = subprocess.run(
        [sys.executable, "-m", "easynlp_tpu.cli", "--mode=export",
         "--app_name=text_classify", "--checkpoint_dir=" + trained_ckpt,
         "--outputs=" + out],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    import torch
    sd = torch.load(out, weights_only=True)
    assert "bert.embeddings.word_embeddings.weight" in sd
    assert any(k.startswith("bert.encoder.layer.0.") for k in sd)


def test_serve_generation_checkpoint(tmp_path):
    """--mode=serve on a sequence_generation checkpoint: the pipeline task
    registration + UDP decode contract (incl. speculative) behind HTTP."""
    import jax.numpy as jnp  # noqa: F401 (forces jax init before server)

    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__),
                                      "fixtures"))
    from make_fixtures import make_bart_ckpt

    from easynlp_tpu.serving import serve
    from easynlp_tpu.testing import make_args

    make_args()
    ckpt = make_bart_ckpt(
        str(tmp_path / "genck"),
        user_defined_parameters="max_decoder_length=10 num_beams=1 "
                                "speculative_decoding=prompt_lookup "
                                "num_draft_tokens=4")
    srv = serve(ckpt, port=0, max_batch_size=4, max_delay_ms=20,
                blocking=False, first_sequence="src", sequence_length=16,
                batch_size=4, dtype=jnp.float32)
    try:
        status, body = _post(
            srv.port, {"inputs": ["the good day the good day", "a bad time"]})
        assert status == 200, body
        outs = body["outputs"]
        assert len(outs) == 2
        for out in outs:
            assert "predictions" in out
            assert isinstance(out["predictions"], str)
    finally:
        srv.stop()
