"""MegatronBERT (capability parity: reference easynlp/modelzoo/models/
megatron_bert/ — Megatron-layout BERT for checkpoint compatibility: pre-LN
blocks + a final encoder LayerNorm; everything else is BERT)."""

import numpy as np

from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.bert.conversion import (
    _dense_t,
    _ln,
    _norm_keys,
)


class MegatronBertConfig(BertConfig):
    model_type = "megatron_bert"


class MegatronBertModel(BertModel):
    pre_layer_norm: bool = True


def convert_megatron_bert(state_dict, config):
    """HF MegatronBertModel layout: per-layer attention.ln + ln, final
    encoder.ln."""
    s = _norm_keys(state_dict)
    L = config.num_hidden_layers

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def layer_qkv(i):
        base = "encoder.layer.%d.attention.self." % i
        kernel = np.concatenate(
            [s[base + n + ".weight"].T for n in ("query", "key", "value")],
            axis=1)
        bias = np.concatenate(
            [s[base + n + ".bias"] for n in ("query", "key", "value")])
        return {"kernel": kernel, "bias": bias}

    p = {"embeddings": {
        "word_embeddings": {"embedding": s["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": s["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": s["embeddings.token_type_embeddings.weight"]},
    }}
    p["encoder"] = {"layers": {
        "attention": {
            "qkv": stack(layer_qkv),
            "output": stack(lambda i: _dense_t(
                s, "encoder.layer.%d.attention.output.dense" % i)),
        },
        # pre-LN names: attention.ln normalises the attn input, ln the MLP in
        "attention_ln": stack(lambda i: _ln(
            s, "encoder.layer.%d.attention.ln" % i)),
        "intermediate": stack(lambda i: _dense_t(
            s, "encoder.layer.%d.intermediate.dense" % i)),
        "output": stack(lambda i: _dense_t(
            s, "encoder.layer.%d.output.dense" % i)),
        "output_ln": stack(lambda i: _ln(s, "encoder.layer.%d.ln" % i)),
    }, "final_ln": _ln(s, "encoder.ln")}
    if "pooler.dense.weight" in s:
        p["pooler"] = {"dense": _dense_t(s, "pooler.dense")}
    return p
