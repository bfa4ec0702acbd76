"""Global args singleton + typed user_defined_parameters parser + phase timers.

Capability parity: reference easynlp/utils/global_vars.py (singleton get_args
:111-114, typed UDP registry :27-61, Timers with cuda.synchronize :255-332 —
ours fences with jax.block_until_ready instead).
"""

import json
import time

_GLOBAL_ARGS = None

# Typed registry for app parameters carried in --user_defined_parameters
# (reference global_vars.py:27-61). Everything else stays a string.
USER_DEFINED_PARAMETERS_TYPES = {
    "pretrain_model_name_or_path": str,
    "language": str,
    "multi_label": bool,
    "enable_distillation": bool,
    "enable_fewshot": bool,
    "type": str,
    "two_tower": bool,
    "siamese": bool,
    "enable_vit": bool,
    "enable_vqgan": bool,
    "loss_type": str,
    "margin": float,
    "gamma": float,
    "embedding_size": int,
    "temperature": float,
    "alpha": float,
    "logits_saved_path": str,
    "logits_name": str,
    "teacher_model_path": str,
    "pattern": str,
    "label_desc": str,
    "dkplm_model_prefix": bool,
    "kangaroo_model_prefix": bool,
    "contrast_learning_flag": bool,
    "mask_language_model": bool,
    "enable_lora": bool,
    "lora_rank": int,
    "lora_alpha": float,
    "lora_targets": str,
    "enable_controlnet": bool,
    "controlnet_hint": str,
    "controlnet_hint_column": str,
    "serve_quantize": str,
    "serve_params_dtype": str,
}


def parse_user_defined_parameters(raw):
    """Parse 'k1=v1 k2=v2' (and app_parameters={json}) into a typed dict."""
    if raw is None:
        return {}
    if isinstance(raw, dict):
        return raw
    params = {}
    raw = raw.strip()
    if not raw:
        return params
    # app_parameters may be a JSON object containing spaces; extract it first.
    key = "app_parameters="
    if key in raw:
        start = raw.index(key) + len(key)
        depth, end = 0, start
        if raw[start] == "{":
            for i in range(start, len(raw)):
                depth += raw[i] == "{"
                depth -= raw[i] == "}"
                if depth == 0:
                    end = i + 1
                    break
            params["app_parameters"] = json.loads(raw[start:end])
            raw = raw[: raw.index(key)] + raw[end:]
    for token in raw.split():
        k, _, v = token.partition("=")
        caster = USER_DEFINED_PARAMETERS_TYPES.get(k, str)
        if caster is bool:
            params[k] = v.lower() in ("true", "1", "yes")
        else:
            try:
                params[k] = caster(v)
            except ValueError:
                params[k] = v
    # Flatten app_parameters into the same namespace with typing, keeping the
    # nested dict too (reference keeps both access styles).
    for k, v in dict(params.get("app_parameters", {})).items():
        caster = USER_DEFINED_PARAMETERS_TYPES.get(k, None)
        if caster is bool and isinstance(v, str):
            v = v.lower() in ("true", "1", "yes")
        elif caster and not isinstance(v, caster):
            try:
                v = caster(v)
            except (TypeError, ValueError):
                pass
        params.setdefault(k, v)
    return params


def set_global_args(args):
    global _GLOBAL_ARGS
    _GLOBAL_ARGS = args
    return args


def get_args():
    assert _GLOBAL_ARGS is not None, "call initialize_easynlp() first"
    return _GLOBAL_ARGS


def has_args():
    return _GLOBAL_ARGS is not None


class _Timer:
    """Phase timer; fences device work so the number is honest
    (reference uses torch.cuda.synchronize; we use block_until_ready on a
    caller-provided fence value, or just wall-clock when none is given)."""

    def __init__(self, name):
        self.name = name
        self.elapsed_ = 0.0
        self.started = False
        self.start_time = 0.0
        self.count = 0

    def start(self):
        assert not self.started
        self.start_time = time.perf_counter()
        self.started = True

    def stop(self, fence=None):
        assert self.started
        if fence is not None:
            import jax
            jax.block_until_ready(fence)
        self.elapsed_ += time.perf_counter() - self.start_time
        self.count += 1
        self.started = False

    def reset(self):
        self.elapsed_ = 0.0
        self.count = 0
        self.started = False

    def elapsed(self, reset=True):
        was_started = self.started
        if was_started:
            self.stop()
        value = self.elapsed_
        if reset:
            self.reset()
        if was_started:
            self.start()
        return value


class Timers:
    def __init__(self):
        self.timers = {}

    def __call__(self, name):
        if name not in self.timers:
            self.timers[name] = _Timer(name)
        return self.timers[name]

    def log(self, names=None, normalizer=1.0, reset=True):
        from easynlp_tpu.utils.logger import logger
        names = names or list(self.timers)
        parts = []
        for name in names:
            if name in self.timers:
                ms = self.timers[name].elapsed(reset=reset) * 1000.0 / normalizer
                parts.append("%s: %.2f ms" % (name, ms))
        if parts:
            logger.info("timers | %s", " | ".join(parts))
