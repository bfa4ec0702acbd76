"""CLI entry.

Capability parity: reference easynlp/cli.py — but single-process: the
reference re-execs `torch.distributed.launch` with one process per GPU
(cli.py:86-100); on TPU one jax process owns every local chip, and multi-host
runs launch this same entry once per host with EASYNLP_PROCESS_INDEX /
EASYNLP_NUM_PROCESSES / --coordinator_address set (initializer.py handles
jax.distributed.initialize). Usage:

    python -m easynlp_tpu.cli --mode=train --app_name=text_classify \
        --tables=train.tsv,dev.tsv --input_schema=... --first_sequence=... \
        --label_name=... --checkpoint_dir=./out
"""

import os
import sys

from easynlp_tpu.appzoo.api import default_main_fn
from easynlp_tpu.utils.initializer import initialize_easynlp


def _maybe_launch_user_script(argv):
    """Reference cli.py:36-81: `--user_script=<tar(.gz)|dir>` +
    `--user_entry_file=<x.py>` fetches the user's code bundle (local or
    oss:// through the io seam), unpacks it, and execs the entry file with
    the remaining args. The reference re-execs torch.distributed.launch;
    on TPU the user entry is a plain single-controller jax program, so a
    direct python exec is the faithful redesign. Returns the exit code, or
    None when the flags are absent."""
    argv = list(argv or [])

    def _pop(flag):
        for i, a in enumerate(argv):
            if a == flag and i + 1 < len(argv):
                v = argv[i + 1]
                del argv[i:i + 2]
                return v
            if a.startswith(flag + "="):
                del argv[i]
                return a.split("=", 1)[1]
        return None

    script = _pop("--user_script")
    entry = _pop("--user_entry_file")
    if script is None or entry is None:
        return None
    if not entry.endswith(".py"):
        raise ValueError("--user_entry_file must be a .py file, got %r"
                         % entry)
    import subprocess
    import tarfile
    import tempfile

    workdir = tempfile.mkdtemp(prefix="easynlp_user_")
    if os.path.isdir(script):
        import shutil
        shutil.copytree(script, workdir, dirs_exist_ok=True)
    else:
        local = script
        if "://" in script:  # oss:// etc. through the pluggable io seam
            from easynlp_tpu.utils.io_utils import io
            local = os.path.join(workdir, os.path.basename(script))
            io.download(script, local)
        with tarfile.open(local) as tf:
            tf.extractall(workdir, filter="data")
    entry_path = os.path.join(workdir, entry)
    if not os.path.isfile(entry_path):
        raise FileNotFoundError("entry file %s not found in %s"
                                % (entry, script))
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    env["PYTHONPATH"] = os.pathsep.join(
        [workdir, env.get("PYTHONPATH", "")])
    return subprocess.call([sys.executable, "-u", entry_path] + argv,
                           cwd=workdir, env=env)


def main(argv=None):
    # EASYNLP_PLATFORM=cpu forces the backend before init via jax.config —
    # needed because on some plugin setups (axon) the JAX_PLATFORMS env var
    # alone does not take effect. Used by the examples smoke tests.
    plat = os.environ.get("EASYNLP_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    rc = _maybe_launch_user_script(argv if argv is not None
                                   else sys.argv[1:])
    if rc is not None:
        return rc
    args = initialize_easynlp(args_list=argv)
    default_main_fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
