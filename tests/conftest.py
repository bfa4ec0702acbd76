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


# --- mmap-exhaustion guard ---------------------------------------------------
# Every fresh XLA:CPU compile JIT-loads code pages (several mmap regions per
# executable) that live as long as jax's in-process executable caches. Across
# the full suite (~150+ test functions x many compiles each on an 8-device
# mesh) the process crosses vm.max_map_count (65530 default): mmap starts
# failing and LLVM's JIT segfaults — observed twice as a mid-suite SIGSEGV in
# backend_compile_and_load at ~test #145, in whatever test happened to compile
# next (maps measured growing ~2.5k per minute of suite). Dropping the
# executable caches after each test MODULE bounds the map count; the
# persistent compile cache makes the re-compiles cheap disk reloads.

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
    gc.collect()
