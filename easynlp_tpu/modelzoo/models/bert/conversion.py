"""Import reference/HF PyTorch BERT checkpoints into our layout.

The reference stores per-layer modules with separate Q/K/V projections
(reference models/bert/modeling_bert.py BertSelfAttention); our encoder uses
one scanned layer with a fused QKV matmul, so conversion = transpose each
torch [out,in] matrix, concatenate q|k|v columns, and stack layers on a
leading axis. Handles both `gamma/beta` (old TF-style, which the reference's
Application.from_pretrained renames — appzoo/application.py:60-75) and
`weight/bias` LayerNorm key dialects, with or without a `bert.` prefix.
"""

import numpy as np


def _norm_keys(state_dict):
    """Strip a leading 'bert.' prefix and normalise gamma/beta names."""
    out = {}
    for k, v in state_dict.items():
        k = k[5:] if k.startswith("bert.") else k
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        out[k] = np.asarray(v)
    return out


def _ln(state, key):
    return {"scale": state[key + ".weight"], "bias": state[key + ".bias"]}


def _dense_t(state, key):
    return {"kernel": state[key + ".weight"].T, "bias": state[key + ".bias"]}


def convert_bert_backbone(state_dict, config):
    """→ params pytree for BertModel."""
    s = _norm_keys(state_dict)
    L = config.num_hidden_layers
    p = {"embeddings": {
        "word_embeddings": {"embedding": s["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": s["embeddings.position_embeddings.weight"]},
        "LayerNorm": _ln(s, "embeddings.LayerNorm"),
    }}
    if "embeddings.token_type_embeddings.weight" in s:
        p["embeddings"]["token_type_embeddings"] = {
            "embedding": s["embeddings.token_type_embeddings.weight"]}

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def layer_qkv(i):
        base = "encoder.layer.%d.attention.self." % i
        kernel = np.concatenate(
            [s[base + n + ".weight"].T for n in ("query", "key", "value")], axis=1)
        bias = np.concatenate(
            [s[base + n + ".bias"] for n in ("query", "key", "value")])
        return {"kernel": kernel, "bias": bias}

    layers = {
        "attention": {
            "qkv": stack(layer_qkv),
            "output": stack(lambda i: _dense_t(
                s, "encoder.layer.%d.attention.output.dense" % i)),
        },
        "attention_ln": stack(lambda i: _ln(
            s, "encoder.layer.%d.attention.output.LayerNorm" % i)),
        "intermediate": stack(lambda i: _dense_t(
            s, "encoder.layer.%d.intermediate.dense" % i)),
        "output": stack(lambda i: _dense_t(
            s, "encoder.layer.%d.output.dense" % i)),
        "output_ln": stack(lambda i: _ln(
            s, "encoder.layer.%d.output.LayerNorm" % i)),
    }
    p["encoder"] = {"layers": layers}
    if "pooler.dense.weight" in s:
        p["pooler"] = {"dense": _dense_t(s, "pooler.dense")}
    return p


def convert_bert_mlm_head(state_dict, config):
    """→ params pytree for BertMLMHead ('cls' collection), if present."""
    s = {k: np.asarray(v) for k, v in state_dict.items()}
    s = {k.replace(".gamma", ".weight").replace(".beta", ".bias"): v
         for k, v in s.items()}
    base = "cls.predictions."
    if base + "transform.dense.weight" not in s:
        return None
    return {
        "transform": _dense_t(s, base + "transform.dense"),
        "transform_ln": _ln(s, base + "transform.LayerNorm"),
        "bias": s[base + "bias"],
    }


def convert_bert_for_masked_lm(state_dict, config):
    params = {"bert": convert_bert_backbone(state_dict, config)}
    params["bert"].pop("pooler", None)
    head = convert_bert_mlm_head(state_dict, config)
    if head is not None:
        params["cls"] = head
    return params
