"""Test config: run everything on a virtual 8-device CPU mesh so DP/TP/FSDP
sharding is exercised without TPU hardware (SURVEY.md §4 implication).

Uses jax.config (not env vars) because pytest plugins may import jax before
this conftest runs; config updates still apply as long as no backend has been
initialised. Override with EASYNLP_TEST_PLATFORM=tpu to run the suite on a
real chip (much faster compiles via the axon tunnel).
"""

import os

import jax

_platform = os.environ.get("EASYNLP_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: single-core CPU compiles here are seconds per
# op and the suite re-runs constantly during development. Fingerprinted per
# host-CPU generation — deserialising an AOT executable compiled on a
# different machine SIGILLs/segfaults (observed mid-suite when the sandbox
# host migrated).
from easynlp_tpu.utils.initializer import host_cache_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/easynlp_tpu_jax_cache/" + host_cache_fingerprint()
                  + "-cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
