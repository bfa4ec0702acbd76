"""Benchmarks. Prints ONE JSON line for the driver.

Primary metric: BERT-base finetune device-step throughput (samples/s/chip).
The same line carries every headline number in `extras`:
  - bert_e2e: full Trainer-loop throughput including the host data path
    (TSV read -> WordPiece tokenisation -> collation -> host->device
    transfer via device_prefetch), the part SURVEY.md §7.3 flags as where
    TPUs starve;
  - clip / diffusion: the other two headline workloads (run as sequential
    subprocesses of bench_clip.py / bench_diffusion.py so a failure in one
    leg cannot take down the primary metric).

Baseline derivation (see BASELINE.md): BASELINE.json's north star is
">= 2x A100 samples/sec/chip on BERT finetune". A100-80GB mixed-precision
BERT-base seq128 finetune is ~500 samples/s (public MLPerf/NVIDIA numbers),
so the 2x target is 1000 and vs_baseline = value / 1000.

Usage: `python bench.py` (all legs) | `python bench.py --only
bert|e2e|clip|diffusion` (one leg in-process).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

A100_BASELINE_SAMPLES_PER_SEC = 500.0
TARGET = 2.0 * A100_BASELINE_SAMPLES_PER_SEC

PRIMARY_METRIC = "bert_base_finetune_samples_per_sec_per_chip"

# Orchestrator wall-clock budget (seconds). The driver runs `python bench.py`
# under its own timeout; if that fires, rc=124 and the LAST line printed so
# far is the record — so this module prints a parseable JSON line (a) at
# startup, (b) after EVERY completed leg, and (c) from a SIGALRM backstop
# handler, making an empty tail impossible.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", "2040"))

# BENCH_TINY=1: shrink the model/batch so the harness itself can be
# smoke-tested on CPU in seconds (numbers are then meaningless)
TINY = bool(int(os.environ.get("BENCH_TINY", "0")))

SEQ_LEN = 128 if not TINY else 16
BATCH = 128 if not TINY else 8
WARMUP_STEPS = 3
MEASURE_STEPS = 20 if not TINY else 4


def _bert_trainer(dataset, args_extra=None):
    import jax.numpy as jnp

    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import bert_base_config, make_args

    args = make_args(micro_batch_size=BATCH, sequence_length=SEQ_LEN,
                     dtype="bfloat16", epoch_num=100.0, logging_steps=10**9,
                     checkpoint_dir=None, remat="names",
                     **(args_extra or {}))
    if TINY:
        from easynlp_tpu.testing import tiny_bert_config
        config = tiny_bert_config(vocab_size=30522)
    else:
        config = bert_base_config(seq_len=512)
    # full layer unroll: no while-loop, XLA schedules across layer
    # boundaries (+13% measured); first compile ~3min, cached afterwards
    config.scan_unroll = config.num_hidden_layers
    module = SequenceClassificationModule(config=config, dtype=jnp.bfloat16,
                                          num_labels=2, remat="names")
    params = SequenceClassification.init_params(module, config)
    app = SequenceClassification(module, params, config)
    return Trainer(app, dataset, evaluator=None, args=args), config


def bench_bert():
    """Device-step throughput: one pre-staged device-resident batch re-fed
    (isolates the compiled train step from the host pipeline)."""
    import jax

    from easynlp_tpu.testing import SyntheticClassificationDataset

    dataset = SyntheticClassificationDataset(
        n=BATCH * 4, seq_len=SEQ_LEN, vocab_size=30522)
    trainer, config = _bert_trainer(dataset)
    batch = next(iter(trainer.train_loader))
    batch.pop("_valid", None)
    device_batch = jax.device_put(batch, trainer.batch_shard)

    params_, opt_state = trainer.params, trainer.opt_state
    for step in range(WARMUP_STEPS):
        params_, opt_state, metrics = trainer._train_step(
            params_, opt_state, device_batch, step)
    # NB: on the axon-tunnel platform block_until_ready can return before the
    # computation finishes; a scalar device->host transfer is the only
    # reliable fence, so the loss value is fetched to synchronise.
    float(metrics["loss"])

    t0 = time.perf_counter()
    for step in range(WARMUP_STEPS, WARMUP_STEPS + MEASURE_STEPS):
        params_, opt_state, metrics = trainer._train_step(
            params_, opt_state, device_batch, step)
    float(metrics["loss"])
    elapsed = time.perf_counter() - t0

    sps = MEASURE_STEPS * BATCH / elapsed / jax.device_count()
    return {
        "metric": "bert_base_finetune_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / TARGET, 4),
    }


E2E_MEASURE_STEPS = 20 if not TINY else 4


def bench_bert_e2e():
    """Training-SYSTEM throughput: the real Trainer data path — TSV on disk,
    WordPiece tokenisation (native C++ fast path), per-step collation and
    host->device transfer through device_prefetch — not a pre-staged batch.
    Reference anchor: the hot loop host-feeds the device
    (reference easynlp/core/trainer.py:617-661)."""
    import os
    import tempfile

    import jax
    import numpy as np

    from easynlp_tpu.appzoo.sequence_classification.data import (
        ClassificationDataset)
    from easynlp_tpu.data.prefetch import device_prefetch
    from easynlp_tpu.modelzoo.models.bert.tokenization_bert import (
        BertTokenizer)

    n_rows = BATCH * (WARMUP_STEPS + E2E_MEASURE_STEPS)
    rng = np.random.RandomState(0)
    words = ["w%04d" % i for i in range(8000)]
    base = tempfile.mkdtemp(prefix="bench_e2e_")
    vocab_path = os.path.join(base, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + words + ["##" + w[1:5] for w in words[:2000]]))
    tsv = os.path.join(base, "train.tsv")
    with open(tsv, "w") as f:
        for i in range(n_rows):
            text = " ".join(words[j] for j in rng.randint(0, 8000, 24))
            f.write("%d\t%s\t%d\n" % (i, text, i % 2))

    tok = BertTokenizer(vocab_path)
    t_feat = time.perf_counter()
    ds = ClassificationDataset(
        tsv, tok, max_seq_length=SEQ_LEN,
        input_schema="id:str:1,sent:str:1,label:str:1",
        first_sequence="sent", label_name="label",
        label_enumerate_values="0,1")
    feat_elapsed = time.perf_counter() - t_feat
    feat_sps = len(ds) / feat_elapsed

    trainer, _ = _bert_trainer(ds)

    def strip_valid(b):
        b.pop("_valid", None)
        return b

    trainer.train_loader.set_epoch(0)
    batches = device_prefetch(iter(trainer.train_loader),
                              sharding=trainer.batch_shard,
                              depth=max(1, trainer.args.num_host_prefetch),
                              transform=strip_valid)
    p, o = trainer.params, trainer.opt_state
    t0 = elapsed = None
    for step, db in enumerate(batches):
        p, o, m = trainer._train_step(p, o, db, step)
        if step + 1 == WARMUP_STEPS:
            float(m["loss"])  # fence (see bench_bert)
            t0 = time.perf_counter()
        if step + 1 == WARMUP_STEPS + E2E_MEASURE_STEPS:
            float(m["loss"])
            elapsed = time.perf_counter() - t0
            break
    assert elapsed is not None, "dataset too small for the measure window"

    sps = E2E_MEASURE_STEPS * BATCH / elapsed / jax.device_count()
    return {
        "metric": "bert_base_finetune_e2e_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / TARGET, 4),
        "featurisation_samples_per_sec": round(feat_sps, 1),
    }


def _run_leg_subprocess(cmd, timeout=1500):
    """Run one leg as a subprocess; return its parsed JSON line or an error
    marker. Sequential (the host has 1 CPU core — never two jax processes).

    Hang-proof by construction: output goes to a temp FILE (no pipes, so
    there is nothing to drain), the child gets its own session, and on
    timeout the whole process GROUP is SIGKILLed — a wedged axon backend
    init that survives a single-process kill (the BENCH_r03 failure mode)
    cannot keep this function blocked."""
    with tempfile.TemporaryFile(mode="w+") as fout:
        proc = subprocess.Popen(cmd, stdout=fout, stderr=subprocess.STDOUT,
                                start_new_session=True, text=True)
        timed_out = False
        try:
            proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            timed_out = True
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                pass  # unreaped zombie; we hold no pipes, so we cannot hang
        fout.seek(0)
        out = fout.read()
    if timed_out:
        return {"error": "timeout after %ds" % timeout}
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {"error": "rc=%d %s" % (proc.returncode, out[-300:])}


def _emit(bert, results):
    """Print (and flush) ONE cumulative JSON line from whatever legs have
    completed so far. Called after EVERY leg and from the SIGALRM backstop:
    the driver parses the LAST line of stdout, so each call supersedes the
    previous — an empty or unparseable tail is impossible by construction."""
    extras = {}
    e2e = results.get("e2e", {})
    if "value" in e2e and e2e["value"]:
        extras["bert_e2e_samples_per_sec_per_chip"] = e2e["value"]
        if bert.get("value"):
            extras["e2e_over_device_ratio"] = round(
                e2e["value"] / bert["value"], 3)
        extras["featurisation_samples_per_sec"] = e2e.get(
            "featurisation_samples_per_sec")
    clip = results.get("clip", {})
    if "value" in clip:
        extras["clip_train_pairs_per_sec_per_chip"] = clip["value"]
    clip_e2e = results.get("clip_e2e", {})
    if "value" in clip_e2e:
        extras["clip_e2e_train_pairs_per_sec_per_chip"] = clip_e2e["value"]
        if clip.get("value"):
            extras["clip_e2e_over_device_ratio"] = round(
                clip_e2e["value"] / clip["value"], 3)
    if "value" in results.get("diffusion", {}):
        extras["sd_ddim50_cfg_images_per_min_per_chip"] = \
            results["diffusion"]["value"]
    if "value" in results.get("decode", {}):
        extras["gpt2_decode_tokens_per_sec_per_chip"] = \
            results["decode"]["value"]
        extras["speculative_decode_speedup"] = results["decode"].get(
            "extras", {}).get("speculative_speedup")
    if "value" in results.get("continuous", {}):
        extras["continuous_batching_tokens_per_sec"] = \
            results["continuous"]["value"]
        extras["continuous_over_coalesced_speedup"] = results[
            "continuous"].get("extras", {}).get("completion_speedup")
    failed = {k: v.get("error") for k, v in results.items() if "error" in v}
    if failed:
        extras["legs_failed"] = failed
    line = json.dumps({
        "metric": PRIMARY_METRIC,
        "value": bert.get("value"),
        "unit": "samples/s/chip",
        "vs_baseline": bert.get("vs_baseline"),
        "extras": extras,
    })
    print(line, flush=True)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    only = None
    if "--only" in argv:
        only = argv[argv.index("--only") + 1]

    # BENCH_PLATFORM=cpu forces the platform before backend init (the axon
    # plugin ignores JAX_PLATFORMS env; jax.config works — see
    # tests/conftest.py). Used to smoke-test the harness off-TPU.
    if os.environ.get("BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    if only == "bert":
        print(json.dumps(bench_bert()), flush=True)
        return 0
    if only == "e2e":
        print(json.dumps(bench_bert_e2e()), flush=True)
        return 0
    if only == "clip":
        import bench_clip
        return bench_clip.main()
    if only == "clip_e2e":
        import bench_clip
        return bench_clip.main_e2e()
    if only == "diffusion":
        import bench_diffusion
        return bench_diffusion.main()
    if only == "decode":
        import bench_decode
        return bench_decode.main()
    if only == "continuous":
        import bench_continuous
        return bench_continuous.main()

    # --- orchestrator: every statement below assumes it may be the last one
    # that ever runs (driver timeout / wedged tunnel), so a parseable record
    # is on stdout from the very first line and refreshed after every leg.
    bert = {"value": None, "vs_baseline": None}
    results = {"_stage": {"error": "preflight"}}
    _emit(bert, results)  # provisional marker: never an empty tail again

    def _on_deadline(signum, frame):
        results["_stage"] = {"error": "bench deadline %ds hit" % DEADLINE_S}
        _emit(bert, results)
        os._exit(3)
    signal.signal(signal.SIGALRM, _on_deadline)
    signal.alarm(int(DEADLINE_S))

    py = sys.executable
    here = os.path.dirname(os.path.abspath(__file__))
    # Pre-flight: a wedged axon tunnel hangs backend init indefinitely; probe
    # device availability in a bounded subprocess so a dead tunnel fails in
    # minutes with a clear marker instead of 7 legs x 900s of hangs. Uses the
    # same tempfile+process-group-kill path as the legs — BENCH_r03 showed a
    # wedged child can outlive subprocess.run's single-process SIGKILL and
    # hang the pipe drain.
    plat = os.environ.get("BENCH_PLATFORM", "")
    probe_src = (
        "import jax\n"
        + ("jax.config.update('jax_platforms', %r)\n" % plat if plat else "")
        + "import json; print(json.dumps({'devices': len(jax.devices())}))\n")
    probe = _run_leg_subprocess([py, "-c", probe_src], timeout=240)
    if "devices" not in probe:
        results["_stage"] = {"error": "tpu_unavailable",
                             "probe": str(probe.get("error", ""))[:300]}
        _emit(bert, results)
        return 1
    del results["_stage"]

    leg_timeout = int(os.environ.get("BENCH_LEG_TIMEOUT", "900"))
    # leg order = information density under the global deadline: the legs a
    # truncated run loses should be the least informative ones. clip_e2e
    # runs LAST because through the sandbox's tunneled TPU it measures link
    # bandwidth, not the host pipeline (docs/performance.md) — a 1500s-
    # deadline run observed losing diffusion/decode/continuous to it.
    legs = [
        ("bert", [py, os.path.join(here, "bench.py"), "--only", "bert"]),
        ("e2e", [py, os.path.join(here, "bench.py"), "--only", "e2e"]),
        ("clip", [py, os.path.join(here, "bench.py"), "--only", "clip"]),
        ("decode", [py, os.path.join(here, "bench.py"), "--only", "decode"]),
        ("continuous",
         [py, os.path.join(here, "bench.py"), "--only", "continuous"]),
        ("diffusion",
         [py, os.path.join(here, "bench.py"), "--only", "diffusion"]),
        ("clip_e2e",
         [py, os.path.join(here, "bench.py"), "--only", "clip_e2e"]),
    ]
    skip = set(filter(None, os.environ.get("BENCH_SKIP", "").split(",")))
    for name, cmd in legs:
        results[name] = ({"error": "skipped"} if name in skip
                         else _run_leg_subprocess(cmd, timeout=leg_timeout))
        if name == "bert" and "value" in results[name]:
            bert = results[name]
        # primary-leg-first: the bert number is on stdout the moment its leg
        # finishes; later legs can only ADD extras, never lose it
        _emit(bert, results)

    return 0 if bert.get("value") is not None else 1


if __name__ == "__main__":
    sys.exit(main())
