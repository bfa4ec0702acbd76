"""Every appzoo tutorial is runnable: `bash run.sh` end-to-end on tiny
synthetic fixtures (reference parity: examples/appzoo_tutorials/* each ship
a runnable .sh — /root/reference/examples/appzoo_tutorials)."""

import os
import subprocess
import sys

import pytest

TUTORIALS = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "appzoo_tutorials")
APPS = sorted(d for d in os.listdir(TUTORIALS)
              if os.path.isfile(os.path.join(TUTORIALS, d, "run.sh")))


def test_tutorial_coverage_is_complete():
    """One tutorial per registered app (18)."""
    import re
    api = open(os.path.join(os.path.dirname(__file__), "..", "easynlp_tpu",
                            "appzoo", "api.py")).read()
    block = re.search(r"MODEL_REGISTRY = \{(.*?)\n\}", api, re.S).group(1)
    registered = set(re.findall(r'^\s{4}"([a-z0-9_]+)":', block, re.M))
    assert registered == set(APPS), (
        "tutorial/app mismatch: missing %s, extra %s"
        % (registered - set(APPS), set(APPS) - registered))


@pytest.mark.parametrize("app", APPS)
def test_tutorial_runs(app, tmp_path):
    env = dict(
        os.environ,
        EASYNLP_PLATFORM="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/easynlp_tpu_jax_cache",
        DATA=str(tmp_path / "data"),
        CKPT=str(tmp_path / "ckpt"),
        PYTHONPATH=os.pathsep.join(
            [os.path.dirname(TUTORIALS) and
             os.path.abspath(os.path.join(TUTORIALS, "..", "..")),
             os.environ.get("PYTHONPATH", "")]),
    )
    res = subprocess.run(
        ["bash", os.path.join(TUTORIALS, app, "run.sh")],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (
        "%s failed:\n--- stdout ---\n%s\n--- stderr ---\n%s"
        % (app, res.stdout[-2000:], res.stderr[-3000:]))
