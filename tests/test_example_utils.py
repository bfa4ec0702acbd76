"""Utility examples beyond the appzoo tutorials: clip_score (pair cosine
similarity evaluate mode, reference examples/clip_score) and
video_frame_extractor (reference examples/video_frame_extractor)."""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EX = os.path.join(REPO, "examples")


def _env(**extra):
    env = dict(os.environ, EASYNLP_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/easynlp_tpu_jax_cache",
               PYTHONPATH=os.pathsep.join(
                   [REPO, os.environ.get("PYTHONPATH", "")]))
    env.update(extra)
    return env


def test_clip_score_example(tmp_path):
    res = subprocess.run(
        ["bash", os.path.join(EX, "clip_score", "clip_score.sh")],
        env=_env(DATA=str(tmp_path / "data")),
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "averaged cosine similarity" in res.stdout


def test_video_frame_extractor(tmp_path):
    import cv2
    import numpy as np

    vdir = tmp_path / "videos"
    vdir.mkdir()
    w = cv2.VideoWriter(str(vdir / "demo.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 4.0, (32, 32))
    for i in range(20):
        w.write(np.full((32, 32, 3), i * 10, np.uint8))
    w.release()
    res = subprocess.run(
        ["bash", os.path.join(EX, "video_frame_extractor", "run.sh")],
        env=_env(VIDEO_DIR=str(vdir), OUT=str(tmp_path / "frames.tsv")),
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-3000:]
    row = (tmp_path / "frames.tsv").read_text().split("\t")
    assert row[0] == "demo"
    frames = row[1].strip().split(",")
    assert len(frames) == 5  # 20 frames @ 4 fps → one per second
    import base64
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(frames[0])))
    assert img.size == (32, 32)

    # fixed-N mode
    res = subprocess.run(
        [sys.executable, os.path.join(EX, "video_frame_extractor", "main.py"),
         "--input", str(tmp_path / "video_paths.tsv"),
         "--output", str(tmp_path / "frames4.tsv"), "--frame_num", "4"],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-3000:]
    row = (tmp_path / "frames4.tsv").read_text().split("\t")
    assert len(row[1].strip().split(",")) == 4


def test_quick_start_user_defined(tmp_path):
    """Library-API main (reference examples/quick_start_user_defined):
    train → evaluate → predict assembled by the user, no --app_name."""
    res = subprocess.run(
        ["bash", os.path.join(EX, "quick_start_user_defined",
                              "run_user_defined_local.sh")],
        env=_env(DATA=str(tmp_path / "data"), CKPT=str(tmp_path / "ckpt")),
        capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (
        res.stdout[-2000:] + "\n" + res.stderr[-3000:])
    assert "eval accuracy" in res.stdout
    assert (tmp_path / "ckpt" / "pred.tsv").exists()


def test_user_script_launch(tmp_path):
    """CLI --user_script/--user_entry_file bundle launch (reference
    cli.py:36-81): untar the user bundle and exec its entry with the
    remaining args."""
    import tarfile

    (tmp_path / "my_main.py").write_text(
        "import sys\nprint('USER ENTRY OK', sys.argv[1:])\n")
    bundle = tmp_path / "bundle.tar.gz"
    with tarfile.open(bundle, "w:gz") as tf:
        tf.add(tmp_path / "my_main.py", arcname="my_main.py")
    res = subprocess.run(
        [sys.executable, "-m", "easynlp_tpu.cli",
         "--user_script=" + str(bundle), "--user_entry_file=my_main.py",
         "--mode=train", "--foo=bar"],
        env=_env(), capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "USER ENTRY OK ['--mode=train', '--foo=bar']" in res.stdout

    # directory form
    res = subprocess.run(
        [sys.executable, "-m", "easynlp_tpu.cli",
         "--user_script", str(tmp_path), "--user_entry_file", "my_main.py"],
        env=_env(), capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "USER ENTRY OK []" in res.stdout


def test_feature_extractor_webdataset(tmp_path):
    """CLIP image features from a webdataset shard (reference
    examples/feature_extractor)."""
    res = subprocess.run(
        ["bash", os.path.join(EX, "feature_extractor",
                              "run_test_webdataset.sh")],
        env=_env(DATA=str(tmp_path / "data")),
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, (
        res.stdout[-2000:] + "\n" + res.stderr[-3000:])
    rows = [l.split("\t") for l in
            (tmp_path / "data" / "features.tsv").read_text().splitlines()]
    assert len(rows) == 12
    import numpy as np
    f = np.array([float(x) for x in rows[0][2].split(",")])
    assert f.shape == (8,)
    assert abs(np.linalg.norm(f) - 1.0) < 1e-3  # L2-normalised
