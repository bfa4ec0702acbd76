"""Auto classes.

Capability parity: reference easynlp/modelzoo/models/auto/ —
CONFIG_MAPPING (configuration_auto.py:42-64), MODEL_MAPPING
(modeling_auto.py:139-310), TOKENIZER_MAPPING (tokenization_auto.py:109) and
the from_pretrained factories keyed by config.json's model_type."""

import json
import os

from easynlp_tpu.utils import get_pretrain_model_path
from easynlp_tpu.utils.io_utils import io


def _lazy(module, name):
    def load():
        import importlib
        return getattr(importlib.import_module(module), name)
    return load


CONFIG_MAPPING = {
    "bert": _lazy("easynlp_tpu.modelzoo.models.bert", "BertConfig"),
    "roberta": _lazy("easynlp_tpu.modelzoo.models.bert", "RobertaConfig"),
    "gpt2": _lazy("easynlp_tpu.modelzoo.models.gpt2", "GPT2Config"),
    "t5": _lazy("easynlp_tpu.modelzoo.models.t5", "T5Config"),
    "mt5": _lazy("easynlp_tpu.modelzoo.models.t5", "MT5Config"),
    "bart": _lazy("easynlp_tpu.modelzoo.models.bart", "BartConfig"),
    "pegasus": _lazy("easynlp_tpu.modelzoo.models.pegasus", "PegasusConfig"),
    "randeng": _lazy("easynlp_tpu.modelzoo.models.randeng", "RandengConfig"),
    "clip": _lazy("easynlp_tpu.modelzoo.models.clip", "CLIPConfig"),
    "glm": _lazy("easynlp_tpu.modelzoo.models.glm", "GLMConfig"),
    "dkplm": _lazy("easynlp_tpu.modelzoo.models.dkplm", "DKPLMConfig"),
    "megatron_bert": _lazy("easynlp_tpu.modelzoo.models.megatron_bert",
                           "MegatronBertConfig"),
    "cnn": _lazy("easynlp_tpu.modelzoo.models.cnn.modeling_cnn",
                 "TextCNNConfig"),
    "bloom": _lazy("easynlp_tpu.modelzoo.models.bloom", "BloomConfig"),
    "kbert": _lazy("easynlp_tpu.modelzoo.models.kbert", "KBertConfig"),
    "kangaroo": _lazy("easynlp_tpu.modelzoo.models.kangaroo",
                      "KangarooConfig"),
    "transformer": _lazy("easynlp_tpu.modelzoo.models.transformer",
                         "TransformerConfig"),
    "ckbert": _lazy("easynlp_tpu.modelzoo.models.ckbert", "CKBertConfig"),
}

MODEL_MAPPING = {
    "bert": _lazy("easynlp_tpu.modelzoo.models.bert", "BertModel"),
    "roberta": _lazy("easynlp_tpu.modelzoo.models.bert", "BertModel"),
    "gpt2": _lazy("easynlp_tpu.modelzoo.models.gpt2", "GPT2LMHeadModel"),
    "t5": _lazy("easynlp_tpu.modelzoo.models.t5", "T5ForConditionalGeneration"),
    "mt5": _lazy("easynlp_tpu.modelzoo.models.t5", "T5ForConditionalGeneration"),
    "bart": _lazy("easynlp_tpu.modelzoo.models.bart",
                  "BartForConditionalGeneration"),
    "pegasus": _lazy("easynlp_tpu.modelzoo.models.pegasus",
                     "PegasusForConditionalGeneration"),
    "randeng": _lazy("easynlp_tpu.modelzoo.models.randeng",
                     "RandengForConditionalGeneration"),
    "clip": _lazy("easynlp_tpu.modelzoo.models.clip", "CLIPModel"),
    "glm": _lazy("easynlp_tpu.modelzoo.models.glm",
                 "GLMForConditionalGeneration"),
    "dkplm": _lazy("easynlp_tpu.modelzoo.models.dkplm", "DKPLMModel"),
    "megatron_bert": _lazy("easynlp_tpu.modelzoo.models.megatron_bert",
                           "MegatronBertModel"),
    "cnn": _lazy("easynlp_tpu.modelzoo.models.cnn.modeling_cnn",
                 "TextCNNModel"),
    "bloom": _lazy("easynlp_tpu.modelzoo.models.bloom", "BloomForCausalLM"),
    "kbert": _lazy("easynlp_tpu.modelzoo.models.kbert", "KBertModel"),
    "kangaroo": _lazy("easynlp_tpu.modelzoo.models.kangaroo", "KangarooModel"),
    "transformer": _lazy("easynlp_tpu.modelzoo.models.transformer",
                         "TransformerGeneratorModel"),
    "ckbert": _lazy("easynlp_tpu.modelzoo.models.ckbert",
                    "CKBertForPreTraining"),
}

TOKENIZER_MAPPING = {
    "bert": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "roberta": _lazy("easynlp_tpu.modelzoo.models.bert.tokenization_roberta",
                     "RobertaTokenizer"),
    "gpt2": _lazy("easynlp_tpu.modelzoo.models.gpt2", "GPT2Tokenizer"),
    "t5": _lazy("easynlp_tpu.modelzoo.models.t5", "T5Tokenizer"),
    "mt5": _lazy("easynlp_tpu.modelzoo.models.t5", "MT5Tokenizer"),
    "bart": _lazy("easynlp_tpu.modelzoo.models.gpt2", "GPT2Tokenizer"),
    "pegasus": _lazy("easynlp_tpu.modelzoo.models.pegasus", "PegasusTokenizer"),
    "randeng": _lazy("easynlp_tpu.modelzoo.models.randeng",
                     "RandengTokenizer"),
    "clip": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "glm": _lazy("easynlp_tpu.modelzoo.models.glm", "GLMTokenizer"),
    "dkplm": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "megatron_bert": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "cnn": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "bloom": _lazy("easynlp_tpu.modelzoo.models.gpt2", "GPT2Tokenizer"),
    "kbert": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "kangaroo": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
    "transformer": _lazy("easynlp_tpu.modelzoo.models.transformer",
                         "TransformerTokenizer"),
    "ckbert": _lazy("easynlp_tpu.modelzoo.models.bert", "BertTokenizer"),
}


def register(model_type, config_cls=None, model_cls=None, tokenizer_cls=None):
    """Extension hook for new families (reference auto_factory register)."""
    if config_cls:
        CONFIG_MAPPING[model_type] = lambda: config_cls
    if model_cls:
        MODEL_MAPPING[model_type] = lambda: model_cls
    if tokenizer_cls:
        TOKENIZER_MAPPING[model_type] = lambda: tokenizer_cls


def _model_type_of(name_or_path):
    path = get_pretrain_model_path(name_or_path)
    cfg = os.path.join(path, "config.json")
    if not io.exists(cfg):
        raise FileNotFoundError("no config.json under %r" % name_or_path)
    with io.open(cfg) as f:
        d = json.load(f)
    mt = d.get("model_type")
    if not mt:
        raise ValueError("config.json at %r has no model_type" % name_or_path)
    return mt, path


class AutoConfig:
    @classmethod
    def from_pretrained(cls, name_or_path, **kwargs):
        mt, path = _model_type_of(name_or_path)
        if mt not in CONFIG_MAPPING:
            raise KeyError("unknown model_type %r (have %s)"
                           % (mt, sorted(CONFIG_MAPPING)))
        return CONFIG_MAPPING[mt]().from_pretrained(path, **kwargs)


class AutoModel:
    @classmethod
    def from_config(cls, config, **kwargs):
        mt = config.model_type
        return MODEL_MAPPING[mt]().from_config(config, **kwargs)

    @classmethod
    def from_pretrained(cls, name_or_path, dtype=None, **kwargs):
        """Returns (module, params) — the functional model pair."""
        import jax.numpy as jnp

        from easynlp_tpu.modelzoo.modeling_utils import (
            available_checkpoint, load_params, load_pytorch_state_dict)

        mt, path = _model_type_of(name_or_path)
        config = CONFIG_MAPPING[mt]().from_pretrained(path)
        module = MODEL_MAPPING[mt]().from_config(
            config, dtype=dtype or jnp.float32, **kwargs)
        flavour = available_checkpoint(path)
        if flavour == "flax":
            params = load_params(path)
        elif flavour == "pytorch":
            state = load_pytorch_state_dict(path)
            if mt in ("bert", "roberta"):
                from easynlp_tpu.modelzoo.models.bert.conversion import (
                    convert_bert_backbone)
                params = convert_bert_backbone(state, config)
            elif mt == "gpt2":
                from easynlp_tpu.modelzoo.models.gpt2.conversion import (
                    convert_gpt2_state_dict)
                params = convert_gpt2_state_dict(state, config)
            elif mt in ("bart", "transformer"):
                from easynlp_tpu.modelzoo.models.bart.conversion import (
                    convert_bart_state_dict)
                params = convert_bart_state_dict(state, config)
            elif mt in ("pegasus", "randeng"):
                from easynlp_tpu.modelzoo.models.pegasus import (
                    convert_pegasus_state_dict)
                params = convert_pegasus_state_dict(state, config)
            elif mt in ("t5", "mt5"):
                from easynlp_tpu.modelzoo.models.t5.conversion import (
                    convert_t5_state_dict)
                params = convert_t5_state_dict(state, config)
            elif mt == "clip":
                from easynlp_tpu.modelzoo.models.clip.conversion import (
                    convert_chinese_clip)
                params = convert_chinese_clip(state, config)
            else:
                raise NotImplementedError("no converter for %r" % mt)
        else:
            params = None
        return module, params


class AutoTokenizer:
    @classmethod
    def from_pretrained(cls, name_or_path, **kwargs):
        mt, path = _model_type_of(name_or_path)
        return TOKENIZER_MAPPING[mt]().from_pretrained(path, **kwargs)
