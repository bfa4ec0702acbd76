"""Pipeline implementation (capability parity: reference
easynlp/pipelines/implementation.py — batch raw inputs through the app's
predictor and return per-example dicts)."""

import importlib
import json
import os

import jax.numpy as jnp

from easynlp_tpu.utils.global_vars import has_args
from easynlp_tpu.utils.io_utils import io


class Pipeline:
    def __init__(self, task, model_path, first_sequence="first_sequence",
                 second_sequence=None, sequence_length=128, batch_size=32,
                 dtype=jnp.bfloat16, quantize=None, params_dtype=None):
        from easynlp_tpu.pipelines import SUPPORTED_TASKS
        if not has_args():
            from easynlp_tpu.testing import make_args
            make_args()
        spec = SUPPORTED_TASKS[task]
        self._diffusion = None
        if spec.get("diffusion"):
            # prompt→image family (reference LatentDiffusionPipeline)
            from easynlp_tpu.appzoo.latent_diffusion.model import (
                StableDiffusionPipeline)
            self._diffusion = StableDiffusionPipeline(model_path, dtype=dtype)
            self.sequence_length = sequence_length
            return
        module_path, cls_name = spec["impl"].split(":")
        predictor_cls = getattr(importlib.import_module(module_path), cls_name)

        from easynlp_tpu.appzoo.api import MODEL_REGISTRY, _resolve
        # choose app variant from the saved train_config when present
        udp = {}
        tc = os.path.join(model_path, "train_config.json")
        if io.exists(tc):
            with io.open(tc) as f:
                saved = json.load(f)
            from easynlp_tpu.utils.global_vars import parse_user_defined_parameters
            udp = parse_user_defined_parameters(
                saved.get("user_defined_parameters"))
        app_cls = _resolve(MODEL_REGISTRY, spec["app"], udp)

        num_labels = 2
        lm = os.path.join(model_path, "label_mapping.json")
        if io.exists(lm):
            with io.open(lm) as f:
                num_labels = max(len(json.load(f)), 2)
        app = app_cls.from_pretrained(model_path, dtype=dtype,
                                      num_labels=num_labels)
        if quantize:
            if quantize != "int8":
                raise ValueError("quantize must be 'int8' (got %r)"
                                 % (quantize,))
            from easynlp_tpu.modelzoo.quantization import (
                quantization_report, quantize_params)
            app.params = quantize_params(app.params)
            qb, ob, n = quantization_report(app.params)
            from easynlp_tpu.utils.logger import logger
            logger.info("int8 weight quantization: %d kernels, params "
                        "%.1f MB -> %.1f MB", n, ob / 1e6, qb / 1e6)
        if params_dtype:
            # serving-side weight cast (e.g. "bfloat16"): halves the HBM
            # weight stream vs f32 checkpoints — the matmuls already read
            # operands at the compute dtype, so the MXU math is unchanged.
            # Composes with quantize: int8 subtrees pass through untouched.
            from easynlp_tpu.modelzoo.quantization import cast_params
            app.params = cast_params(app.params, jnp.dtype(params_dtype))
        self.first_sequence = first_sequence
        self.second_sequence = second_sequence
        self.predictor = predictor_cls(
            model_path, app, first_sequence=first_sequence,
            second_sequence=second_sequence, sequence_length=sequence_length,
            batch_size=batch_size, user_defined_parameters=udp)

    def __call__(self, inputs):
        """inputs: str | list[str] | list[(a, b)] → list of result dicts."""
        single = isinstance(inputs, str)
        if single:
            inputs = [inputs]
        if self._diffusion is not None:
            rows = self._diffusion(
                list(inputs), sequence_length=min(self.sequence_length, 77))
            return rows[0] if single else rows
        if inputs and isinstance(inputs[0], (tuple, list)):
            # resolve the pair column the predictor will actually read: an
            # explicit second_sequence, the predictor's own default (e.g.
            # MRC's "context"), or wire the fallback key into the predictor
            # so pair inputs are consumed rather than silently ignored
            second = (self.second_sequence
                      or getattr(self.predictor, "second_sequence", None)
                      or getattr(self.predictor, "context_col", None))
            if not second:
                second = "second_sequence"
                if hasattr(self.predictor, "second_sequence"):
                    self.predictor.second_sequence = second
            data = {self.first_sequence: [a for a, _ in inputs],
                    second: [b for _, b in inputs]}
        else:
            data = {self.first_sequence: list(inputs)}
        result = self.predictor.run(data)
        n = len(inputs)
        keys = [k for k, v in result.items()
                if isinstance(v, (list, tuple)) and len(v) == n
                and not k.startswith("_")]
        rows = [{k: result[k][i] for k in keys} for i in range(n)]
        return rows[0] if single else rows
