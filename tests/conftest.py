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


# --- smoke/slow tiers ---------------------------------------------------------
# `pytest -m smoke` = the fast tier (<10 min single-core); the full suite (no
# -m filter) stays the round gate. Modules listed here dominated the measured
# full-suite wall clock (--durations of the 2026-08-19 run: e2e tutorial runs
# 35-72s each, LDM train step 94s, ...); every test NOT in a slow module is
# auto-marked smoke so the fast tier tracks new tests by default.

SLOW_MODULES = {
    "test_examples", "test_example_utils", "test_latent_diffusion",
    "test_diffusion_stack", "test_controlnet", "test_olss",
    "test_e2e_classification", "test_e2e_vision", "test_apps2",
    "test_kangaroo", "test_pipeline_parallel", "test_multichip_parity",
    "test_multihost", "test_glm_finetune", "test_metakd",
    "test_multimodal", "test_clue_benchmark", "test_hf_adapter",
    "test_optimizer_trajectory", "test_trajectory_mrc_labeling",
    "test_generation", "test_seq2seq", "test_continuous_batching",
    "test_continuous_prefix", "test_speculative", "test_lora",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1][:-3]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        elif item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.smoke)
