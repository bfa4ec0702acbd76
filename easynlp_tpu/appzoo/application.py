"""Application base.

Capability parity: reference easynlp/appzoo/application.py (Application
contract :26-99 — forward/compute_loss/from_pretrained with key-rename
handling and missing/unexpected reporting). TPU-native shape: an Application
*holds* a functional (flax module, params) pair plus pure loss/metric
functions; the Trainer jits `module.apply` + `loss_fn`, the Predictor jits
`module.apply` alone. Nothing on the app is stateful during a step.
"""

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import meta

from easynlp_tpu.modelzoo.modeling_utils import (
    available_checkpoint,
    load_params,
    load_pytorch_state_dict,
    merge_params,
)
from easynlp_tpu.utils.logger import logger


def extract_logical_axes(boxed_params):
    """Pytree of logical-axis tuples (or None) parallel to the param tree."""
    def axes(leaf):
        if isinstance(leaf, meta.Partitioned):
            return leaf.names
        return None
    return jax.tree.map(axes, boxed_params,
                        is_leaf=lambda x: isinstance(x, meta.Partitioned))


class Application:
    """Base application: subclasses define
      - build_module(config, args, **kw) -> flax module
      - loss_fn(outputs, batch) -> {'loss': scalar, ...}       (pure jnp)
      - model_input_keys: batch keys forwarded to module.apply
    and may carry label_mapping / tokenizer references."""

    model_input_keys = ("input_ids", "attention_mask", "token_type_ids")

    def __init__(self, module, params, config, label_mapping=None):
        self.module = module
        self.params = params
        self.config = config
        self.label_mapping = label_mapping or {}

        # logical axes for sharding (from an abstract init)
        sample = self.sample_inputs()
        boxed = jax.eval_shape(
            lambda rng: module.init(rng, **sample, deterministic=True),
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)})
        self.param_logical_axes = extract_logical_axes(boxed["params"])

    # -- subclass hooks -------------------------------------------------------
    def sample_inputs(self) -> Dict[str, Any]:
        ids = jnp.ones((1, 8), jnp.int32)
        return {"input_ids": ids}

    @staticmethod
    def loss_fn(outputs, batch):
        raise NotImplementedError

    # -- forward (inference) --------------------------------------------------
    def forward(self, batch, params=None):
        inputs = {k: batch[k] for k in self.model_input_keys if k in batch}
        return self.module.apply({"params": params or self.params}, **inputs,
                                 deterministic=True)

    # -- construction ---------------------------------------------------------
    @classmethod
    def build_module(cls, config, args=None, **kwargs):
        raise NotImplementedError

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        """Map a reference/HF torch checkpoint onto this app's param layout.
        Subclasses override per backbone family."""
        raise NotImplementedError

    @classmethod
    def from_pretrained(cls, model_dir, args=None, label_mapping=None,
                        dtype=jnp.float32, seed=0, **kwargs):
        """Load config + weights from model_dir; freshly-initialised params
        (heads) are reported, mirroring reference from_pretrained."""
        config = cls.load_config(model_dir, **kwargs)
        if args is not None and getattr(args, "scan_unroll", 1) > 1:
            # --scan_unroll flows through the config (read by the encoders'
            # nn.scan); param layout is unroll-invariant
            config.scan_unroll = int(args.scan_unroll)
        module = cls.build_module(config, args=args, dtype=dtype, **kwargs)
        self = cls.__new__(cls)
        cls.__init__(self, module, cls.init_params(module, config, seed),
                     config, label_mapping=label_mapping)
        flavour = available_checkpoint(model_dir)
        if flavour == "flax":
            loaded = load_params(model_dir)
            self.params = merge_params(self.params, loaded)
        elif flavour == "pytorch":
            state = load_pytorch_state_dict(model_dir)
            converted = cls.convert_pytorch_state_dict(state, config)
            self.params = merge_params(self.params, converted)
        else:
            logger.warning("no weights found in %s; random init", model_dir)
        return self

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        raise NotImplementedError

    @classmethod
    def init_params(cls, module, config, seed=0):
        sample_ids = jnp.ones((1, 8), jnp.int32)
        rng = jax.random.PRNGKey(seed)
        variables = module.init({"params": rng, "dropout": rng},
                                input_ids=sample_ids, deterministic=True)
        return nn.unbox(variables["params"])
