"""Model base machinery.

Capability parity: reference easynlp/modelzoo/modeling_utils.py
(PreTrainedModel.from_pretrained/save_pretrained, weight tying, init-key
reporting). TPU-native re-design: models are *functional* flax modules —
parameters live outside the module in a pytree the Trainer/Predictor owns and
pjit shards — so "a model" is a (module, params) pair produced by the
classmethods here.

Checkpoint formats:
  - native: `flax_params.msgpack` (flax serialization) + config.json
  - import: `pytorch_model.bin` via a per-family conversion function
    (torch CPU is available in this environment; the converter maps HF/
    reference key layouts onto our fused-QKV, scanned-layer layout)
"""

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import serialization
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

from easynlp_tpu.utils.io_utils import io
from easynlp_tpu.utils.logger import logger

PARAMS_NAME = "flax_params.msgpack"
PYTORCH_WEIGHTS_NAME = "pytorch_model.bin"


def truncated_normal_init(stddev):
    """BERT-style truncated normal initialiser (reference modeling_utils
    _init_weights semantics: N(0, initializer_range) truncated at 2σ)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev
    return init


def with_logical(init_fn, axes):
    return nn.with_logical_partitioning(init_fn, axes)


class BaseModule(nn.Module):
    """Base for all zoo modules: carries the config and the compute dtype.
    Params are always fp32; `dtype` controls activation/matmul precision."""

    config: Any = None
    dtype: Any = jnp.float32

    # -- functional model construction ---------------------------------------
    @classmethod
    def from_config(cls, config, dtype=jnp.float32, **kwargs):
        return cls(config=config, dtype=dtype, **kwargs)

    def init_params(self, rng, sample_inputs):
        variables = self.init(rng, **sample_inputs, deterministic=True)
        return variables["params"]


# -----------------------------------------------------------------------------
# Parameter persistence
# -----------------------------------------------------------------------------

def save_params(params, save_directory, name=PARAMS_NAME):
    io.makedirs(save_directory)
    params = jax.device_get(nn.unbox(params))
    data = serialization.to_bytes(params)
    with io.open(os.path.join(save_directory, name), "wb") as f:
        f.write(data)


def load_params(model_dir, target=None, name=PARAMS_NAME):
    path = os.path.join(model_dir, name)
    with io.open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def load_pytorch_state_dict(model_dir_or_file):
    """Read a reference/HF `pytorch_model.bin` into {name: np.ndarray}."""
    path = model_dir_or_file
    if io.isdir(path):
        path = os.path.join(path, PYTORCH_WEIGHTS_NAME)
    import torch  # CPU torch, only used for checkpoint import

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def available_checkpoint(model_dir):
    """Which checkpoint flavour exists in model_dir: 'flax' | 'pytorch' | None."""
    if io.exists(os.path.join(model_dir, PARAMS_NAME)):
        return "flax"
    if io.exists(os.path.join(model_dir, PYTORCH_WEIGHTS_NAME)):
        return "pytorch"
    return None


def merge_params(target, loaded, allow_missing=True):
    """Overlay `loaded` onto `target` (both param pytrees), reporting missing
    and unexpected keys like the reference's print_init_keys_info."""
    t = flatten_dict(unfreeze(target))
    l = flatten_dict(unfreeze(loaded) if hasattr(loaded, "keys") else loaded)
    missing = [k for k in t if k not in l]
    unexpected = [k for k in l if k not in t]
    out = {}
    for k, v in t.items():
        if k in l:
            lv = jnp.asarray(l[k])
            if lv.shape != v.shape:
                raise ValueError("shape mismatch for %s: ckpt %s vs model %s"
                                 % ("/".join(k), lv.shape, v.shape))
            out[k] = lv.astype(v.dtype)
        else:
            out[k] = v
    if missing:
        logger.info("params initialised from scratch (not in checkpoint): %s",
                    ["/".join(k) for k in missing[:12]]
                    + (["..."] if len(missing) > 12 else []))
    if unexpected:
        logger.info("checkpoint params unused by model: %s",
                    ["/".join(k) for k in unexpected[:12]]
                    + (["..."] if len(unexpected) > 12 else []))
    if missing and not allow_missing:
        raise ValueError("missing params: %s" % missing)
    return unflatten_dict(out)


def param_count(params):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cast_floating(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def scan_unroll(config, num_layers):
    """Layers per nn.scan iteration (config.scan_unroll / --scan_unroll).
    >= num_layers removes the XLA while-loop entirely — v5e-measured +13%
    on BERT-base — at the cost of a longer (cached) first compile. The
    stacked 'layers' param axis is identical at any unroll, so checkpoints
    are interchangeable. Partial unroll measured counterproductive; clamp
    keeps whatever the user asked for valid."""
    return max(1, min(int(getattr(config, "scan_unroll", 1) or 1),
                      int(num_layers)))
