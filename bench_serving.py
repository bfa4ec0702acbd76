"""Online-serving benchmark: requests/s and latency through the HTTP
micro-batching server (easynlp_tpu/serving) on a BERT classify pipeline.

Standalone (not part of bench.py's official JSON): prints one JSON line
  {"metric": "serving_examples_per_sec", ...,
   "extras": {p50_ms, p99_ms, batches, mean_batch}}

Concurrency model: N closed-loop client threads fire single-example
requests; the server coalesces them into device batches (max_batch_size =
--micro_batch_size analogue below). Compares singleton latency against
coalesced throughput — the point of the batcher.

BENCH_TINY=1 shrinks the model for CPU smoke runs.
BENCH_QUANTIZE=int8 serves the weight-only-quantized model (A/B the uplift).
"""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

TINY = bool(int(os.environ.get("BENCH_TINY", "0")))
SEQ_LEN = 128 if not TINY else 16
MAX_BATCH = 64 if not TINY else 8
CLIENTS = 32 if not TINY else 6
REQUESTS_PER_CLIENT = 20 if not TINY else 3


def _build_model_dir(base):
    """vocab + config + label_mapping so the predictor can load."""
    words = ["w%04d" % i for i in range(8000)]
    with open(os.path.join(base, "vocab.txt"), "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + words))
    with open(os.path.join(base, "label_mapping.json"), "w") as f:
        json.dump({"neg": 0, "pos": 1}, f)
    return words


def main():
    if os.environ.get("BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    import jax.numpy as jnp
    import numpy as np

    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)
    from easynlp_tpu.appzoo.sequence_classification.predictor import (
        SequenceClassificationPredictor)
    from easynlp_tpu.serving import PredictionServer
    from easynlp_tpu.testing import bert_base_config, make_args, \
        tiny_bert_config

    make_args(micro_batch_size=MAX_BATCH, sequence_length=SEQ_LEN,
              dtype="bfloat16")
    base = tempfile.mkdtemp(prefix="bench_serving_")
    words = _build_model_dir(base)
    config = (tiny_bert_config(vocab_size=8005) if TINY
              else bert_base_config(seq_len=512))
    module = SequenceClassificationModule(config=config, dtype=jnp.bfloat16,
                                          num_labels=2)
    params = SequenceClassification.init_params(module, config)
    app = SequenceClassification(module, params, config)
    quantize = os.environ.get("BENCH_QUANTIZE", "")  # "int8" to measure the
    if quantize:                                     # weight-only serving path
        from easynlp_tpu.modelzoo.quantization import (quantization_report,
                                                       quantize_params)
        app.params = quantize_params(app.params)
        qb, ob, _ = quantization_report(app.params)
        print("# int8: params %.1f MB -> %.1f MB" % (ob / 1e6, qb / 1e6),
              file=sys.stderr)
    predictor = SequenceClassificationPredictor(
        base, app, first_sequence="sent", sequence_length=SEQ_LEN,
        batch_size=MAX_BATCH)

    def pipe(inputs):
        result = predictor.run({"sent": list(inputs)})
        preds = result["predictions"]
        return [{"predictions": p} for p in preds]

    srv = PredictionServer(pipe, port=0, max_batch_size=MAX_BATCH,
                           max_delay_ms=3.0).start()
    url = "http://127.0.0.1:%d/predict" % srv.port
    rng = np.random.RandomState(0)

    def one_request():
        text = " ".join(words[j] for j in rng.randint(0, 8000, 16))
        body = json.dumps({"input": text}).encode()
        t0 = time.perf_counter()
        with urllib.request.urlopen(
                urllib.request.Request(url, data=body), timeout=120) as r:
            json.loads(r.read())
        return (time.perf_counter() - t0) * 1e3

    one_request()  # warm the compile

    latencies, lock = [], threading.Lock()

    def client():
        for _ in range(REQUESTS_PER_CLIENT):
            ms = one_request()
            with lock:
                latencies.append(ms)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0

    n = CLIENTS * REQUESTS_PER_CLIENT
    eps = n / elapsed
    lat = sorted(latencies)
    stats = srv.stats
    srv.stop()
    print(json.dumps({
        "metric": "serving_examples_per_sec",
        "value": round(eps, 2),
        "unit": "examples/s (closed-loop, %d clients)" % CLIENTS,
        "vs_baseline": None,
        "extras": {
            "quantize": quantize or "none",
            "p50_ms": round(lat[len(lat) // 2], 2),
            "p99_ms": round(lat[int(len(lat) * 0.99) - 1], 2),
            "device_batches": stats["batches"],
            "mean_batch": round(stats["examples"]
                                / max(stats["batches"], 1), 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
