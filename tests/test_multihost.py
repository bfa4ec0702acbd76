"""Multi-host initialisation: 2 real processes through
initialize_easynlp's jax.distributed seam (reference
utils/initializer.py:98-144 tcp:// rendezvous → here the JAX coordination
service), verifying process topology, the global mesh spanning both
processes, and a cross-process collective."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import easynlp_tpu
coordinator, index = sys.argv[1], sys.argv[2]
args = easynlp_tpu.initialize_easynlp(args_list=[
    "--mode=train", "--app_name=text_classify",
    "--coordinator_address=" + coordinator,
    "--num_processes=2", "--process_index=" + index,
])
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 procs
assert dict(args.global_mesh.shape) == {"data": 4}, args.global_mesh.shape

# a collective across both processes: sum of per-device ranks = 0+1+2+3
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec
import numpy as np
mesh = args.global_mesh
vals = jax.device_put(
    np.arange(4, dtype=np.float32),
    NamedSharding(mesh, PartitionSpec("data")))
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, PartitionSpec()))(vals)
assert float(total) == 6.0, float(total)
print("MULTIHOST_OK", index)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_initialisation(tmp_path):
    coordinator = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = []
    for index in ("0", "1"):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, index],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=540)
        outs.append(out.decode("utf-8", errors="replace"))
    for index, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, "worker %d failed:\n%s" % (index, out)
        assert "MULTIHOST_OK" in out
