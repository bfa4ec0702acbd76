"""The bench.py orchestrator must NEVER leave the driver an empty stdout
tail: a parseable JSON line is printed at startup, after every leg, and from
the SIGALRM/deadline backstop, and a wedged leg (the BENCH_r03 failure mode:
a child blocked in axon backend init that survives a single-process SIGKILL)
is killed as a whole process group with no pipes to drain.

Pure-subprocess tests — no jax import, safe to run anywhere in the suite.
"""

import json
import subprocess
import sys
import time

import pytest

REPO = __file__.rsplit("/tests/", 1)[0]


@pytest.mark.smoke
def test_leg_timeout_kills_whole_process_group():
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    # the leg spawns a GRANDCHILD; a single-process kill would leave it
    # holding the (nonexistent, by design) pipe — the group kill + tempfile
    # output must return promptly either way
    t0 = time.time()
    r = bench._run_leg_subprocess(
        [sys.executable, "-c",
         "import subprocess,sys,time;"
         "subprocess.Popen([sys.executable,'-c','import time;time.sleep(90)']);"
         "time.sleep(90)"],
        timeout=3)
    assert "error" in r and "timeout" in r["error"]
    assert time.time() - t0 < 30


@pytest.mark.smoke
def test_deadline_emits_parseable_line_and_exits():
    # probe + legs stubbed to hang; the 2s SIGALRM must print a cumulative
    # JSON line and exit 3 — the driver's record can never be empty
    src = (
        "import os, time\n"
        "os.environ['BENCH_DEADLINE'] = '2'\n"
        "import bench\n"
        "bench._run_leg_subprocess = "
        "lambda cmd, timeout=900: (time.sleep(60), {})[1]\n"
        "raise SystemExit(bench.main([]))\n")
    out = subprocess.run([sys.executable, "-c", src], capture_output=True,
                         text=True, timeout=60, cwd=REPO)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert out.returncode == 3, (out.returncode, out.stdout, out.stderr)
    # provisional marker first, deadline emission last
    assert len(lines) >= 2
    first, last = json.loads(lines[0]), json.loads(lines[-1])
    assert first["metric"] == last["metric"] \
        == "bert_base_finetune_samples_per_sec_per_chip"
    assert "deadline" in json.dumps(last["extras"])


@pytest.mark.smoke
def test_probe_failure_emits_tpu_unavailable_marker():
    src = (
        "import bench\n"
        "bench._run_leg_subprocess = "
        "lambda cmd, timeout=900: {'error': 'timeout after %ds' % timeout}\n"
        "raise SystemExit(bench.main([]))\n")
    out = subprocess.run([sys.executable, "-c", src], capture_output=True,
                         text=True, timeout=60, cwd=REPO)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert out.returncode == 1
    last = json.loads(lines[-1])
    assert last["value"] is None
    assert last["extras"]["legs_failed"]["_stage"] == "tpu_unavailable"


def _run_orchestrator_with_fake(fake_src):
    src = (
        "import json, os\n"
        # big enough that the retry pass's >=120s-remaining guard passes
        # (everything is stubbed, so the run still finishes in seconds)
        "os.environ['BENCH_DEADLINE'] = '3600'\n"
        "import bench\n"
        + fake_src
        + "bench._run_leg_subprocess = fake\n"
        "raise SystemExit(bench.main([]))\n")
    out = subprocess.run([sys.executable, "-c", src], capture_output=True,
                         text=True, timeout=60, cwd=REPO)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    return out.returncode, [json.loads(l) for l in lines]


@pytest.mark.smoke
def test_failed_leg_is_retried_once_and_recovers():
    """A leg that dies on its first run (the BENCH_r04 clip INTERNAL-crash
    mode) gets exactly one retry within the deadline; a successful retry
    clears its legs_failed marker and the recovered number lands."""
    rc, recs = _run_orchestrator_with_fake(
        "calls = {}\n"
        "def fake(cmd, timeout=900):\n"
        "    if cmd[1] == '-c': return {'devices': 1}\n"
        "    if cmd[-1] == '--prewarm': return {'prewarmed': 'x'}\n"
        "    name = cmd[-1]\n"
        "    calls[name] = calls.get(name, 0) + 1\n"
        "    if name == 'clip' and calls[name] == 1:\n"
        "        return {'error': 'rc=1 INTERNAL: TPU backend error'}\n"
        "    if name == 'bert':\n"
        "        return {'metric': 'm', 'value': 1200.0,"
        " 'vs_baseline': 1.2}\n"
        "    return {'metric': name, 'value': 42.0, 'extras': {}}\n")
    assert rc == 0
    last = recs[-1]
    assert last["value"] == 1200.0
    assert "legs_failed" not in last["extras"], last["extras"]
    assert last["extras"]["legs_retried"] == "clip"
    assert last["extras"]["clip_train_pairs_per_sec_per_chip"] == 42.0
    # mid-run record captured the failure before the retry cleared it
    assert any("legs_failed" in r.get("extras", {})
               and "clip" in r["extras"]["legs_failed"] for r in recs)


@pytest.mark.smoke
def test_leg_failing_twice_keeps_both_markers():
    rc, recs = _run_orchestrator_with_fake(
        "def fake(cmd, timeout=900):\n"
        "    if cmd[1] == '-c': return {'devices': 1}\n"
        "    if cmd[-1] == '--prewarm': return {'prewarmed': 'x'}\n"
        "    name = cmd[-1]\n"
        "    if name == 'diffusion':\n"
        "        return {'error': 'timeout after %ds' % timeout}\n"
        "    if name == 'bert':\n"
        "        return {'metric': 'm', 'value': 1200.0,"
        " 'vs_baseline': 1.2}\n"
        "    return {'metric': name, 'value': 42.0, 'extras': {}}\n")
    assert rc == 0
    last = recs[-1]
    assert "diffusion" in last["extras"]["legs_failed"]
    assert "diffusion" in last["extras"]["legs_retry_failed"]
    assert last["extras"]["legs_retried"] == "diffusion"


@pytest.mark.smoke
def test_prewarm_failure_is_nonfatal_and_noted():
    rc, recs = _run_orchestrator_with_fake(
        "def fake(cmd, timeout=900):\n"
        "    if cmd[1] == '-c': return {'devices': 1}\n"
        "    if cmd[-1] == '--prewarm':\n"
        "        return {'error': 'timeout after %ds' % timeout}\n"
        "    name = cmd[-1]\n"
        "    if name == 'bert':\n"
        "        return {'metric': 'm', 'value': 1200.0,"
        " 'vs_baseline': 1.2}\n"
        "    return {'metric': name, 'value': 42.0, 'extras': {}}\n")
    assert rc == 0
    last = recs[-1]
    assert "legs_failed" not in last["extras"]
    assert "timeout" in last["extras"]["prewarm_diffusion_failed"]
    assert "timeout" in last["extras"]["prewarm_clip_failed"]
