"""Runtime initialisation.

Capability parity: reference easynlp/utils/initializer.py:29-189
(set globals → distributed init → seeds → model-path resolution), TPU-native:
`jax.distributed.initialize` + a `jax.sharding.Mesh` replace the NCCL/Gloo
process group, and there is no per-rank device binding — jax owns all local
chips in a single process.
"""

import os
import random

import numpy as np

from easynlp_tpu.utils.arguments import parse_args, parse_mesh_spec
from easynlp_tpu.utils.global_vars import (
    get_args,
    parse_user_defined_parameters,
    set_global_args,
)
from easynlp_tpu.utils.logger import init_logger, logger


def host_cache_fingerprint():
    """CPU-feature + jaxlib fingerprint for persistent-cache isolation.

    XLA:CPU AOT executables are compiled against the build host's CPU
    features; loading them on a host with different features can SIGILL /
    segfault (cpu_aot_loader warns, then crashes in
    compilation_cache.get_executable_and_time). Sandboxed hosts here
    migrate between CPU generations, so key the cache dir by the feature
    set instead of sharing one dir across incompatible machines."""
    import hashlib

    import jaxlib

    ident = []
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "Features") and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                # model identity matters beyond the flag list: XLA derives
                # per-model tuning features (e.g. prefer-no-scatter) from
                # cpuid, and two hosts with identical flag lists can still
                # produce mutually SIGILL-ing AOT executables
                elif key in ("vendor_id", "cpu family", "model",
                             "model name", "stepping") \
                        and len(ident) < 5:
                    ident.append(line.split(":", 1)[1].strip())
                if key == "power management":  # end of first cpu block
                    break
    except OSError:
        pass
    h = hashlib.md5(("%s|%s|%s" % (flags, ";".join(ident),
                                   getattr(jaxlib, "__version__", "")))
                    .encode()).hexdigest()[:10]
    return h


def enable_compile_cache():
    """Persistent compile cache: XLA/Mosaic compilation is partly host-side
    and hosts can be slow; identical programs then load in milliseconds.
    The dir is suffixed with a host-CPU fingerprint (see
    host_cache_fingerprint) so entries AOT-compiled on a different machine
    generation are never deserialised."""
    import jax

    cache_dir = (os.environ.get("EASYNLP_COMPILE_CACHE")
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.easynlp_tpu/jax_cache"))
    if cache_dir:
        # keyed by platform too: under the axon relay, compilation happens
        # on the relay's machine — its CPU AOT artifacts must never be
        # shared with pure-CPU runs on this host (SIGILL/segfault risk)
        platform = (jax.config.jax_platforms or "default").split(",")[0]
        cache_dir = os.path.join(cache_dir,
                                 host_cache_fingerprint() + "-" + platform)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _initialize_distributed(args):
    import jax

    enable_compile_cache()

    if args.num_processes and args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_index,
        )
        args.process_index = jax.process_index()
    args.n_devices = jax.device_count()
    args.n_local_devices = jax.local_device_count()
    args.platform = jax.devices()[0].platform


def _set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def _build_mesh(args):
    from easynlp_tpu.parallel.mesh import build_mesh, set_global_mesh

    axis_sizes = parse_mesh_spec(args.mesh, args.n_devices)
    mesh = set_global_mesh(build_mesh(axis_sizes))
    args.mesh_axis_sizes = axis_sizes
    logger.info("device mesh: %s over %d %s device(s)",
                dict(mesh.shape), args.n_devices, args.platform)
    return mesh


def initialize_easynlp(extra_args_provider=None, args_list=None):
    """Parse args, init distributed jax, seed, build the mesh. Returns args.

    Mirrors the reference call sites: every entry path (CLI main, library use)
    funnels through here exactly once.
    """
    # EASYNLP_PLATFORM=cpu forces the backend before any jax init — honored
    # here (not only in cli.main) so user-defined library mains get it too.
    # jax.config, not JAX_PLATFORMS: on plugin setups (axon) the env var
    # alone does not take effect once the plugin is discovered.
    plat = os.environ.get("EASYNLP_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    args = parse_args(extra_args_provider=extra_args_provider, args_list=args_list)
    set_global_args(args)
    init_logger(args.process_index)
    args.user_defined_parameters_dict = parse_user_defined_parameters(
        args.user_defined_parameters)

    _initialize_distributed(args)
    _set_random_seed(args.random_seed)
    mesh = _build_mesh(args)
    args.global_mesh = mesh

    if getattr(args, "use_flash_attention", "auto") != "auto":
        from easynlp_tpu.ops.attention import set_kernel_override
        set_kernel_override(args.use_flash_attention == "true")

    if args.pretrained_model_name_or_path is None:
        args.pretrained_model_name_or_path = \
            args.user_defined_parameters_dict.get("pretrain_model_name_or_path")
    if args.pretrained_model_name_or_path:
        from easynlp_tpu.utils import get_pretrain_model_path
        args.pretrained_model_name_or_path = get_pretrain_model_path(
            args.pretrained_model_name_or_path)

    logger.info("EasyNLP-TPU initialised: app=%s mode=%s dtype=%s",
                args.app_name, args.mode, args.dtype)
    return args


def is_initialized():
    try:
        get_args()
        return True
    except AssertionError:
        return False


def get_cache_root():
    return os.environ.get("EASYNLP_CACHE_ROOT",
                          os.path.expanduser("~/.easynlp_tpu"))
