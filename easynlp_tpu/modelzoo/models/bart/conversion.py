"""Import HF/reference torch BART/Pegasus checkpoints."""

import numpy as np


def convert_bart_state_dict(state_dict, config):
    s = {}
    for k, v in state_dict.items():
        k = k[len("model."):] if k.startswith("model.") else k
        s[k] = np.asarray(v)

    def dense(key):
        out = {"kernel": s[key + ".weight"].T}
        if key + ".bias" in s:
            out["bias"] = s[key + ".bias"]
        return out

    def ln(key):
        return {"scale": s[key + ".weight"], "bias": s[key + ".bias"]}

    def _stack_tree(per):
        out = {}
        for k in per[0]:
            if isinstance(per[0][k], dict):
                out[k] = _stack_tree([p[k] for p in per])
            else:
                out[k] = np.stack([p[k] for p in per])
        return out

    def layer(prefix, i, is_decoder):
        base = "%s.layers.%d." % (prefix, i)
        out = {
            "self_attn": {n: dense(base + "self_attn." + n)
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "self_attn_layer_norm": ln(base + "self_attn_layer_norm"),
            "fc1": dense(base + "fc1"),
            "fc2": dense(base + "fc2"),
            "final_layer_norm": ln(base + "final_layer_norm"),
        }
        if is_decoder:
            out["encoder_attn"] = {
                n: dense(base + "encoder_attn." + n)
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")}
            out["encoder_attn_layer_norm"] = ln(
                base + "encoder_attn_layer_norm")
        return out

    def stack_side(prefix, n, is_decoder):
        side = {
            "embed_tokens": {"embedding": s.get(
                prefix + ".embed_tokens.weight", s.get("shared.weight"))},
            "layers": _stack_tree(
                [layer(prefix, i, is_decoder) for i in range(n)]),
        }
        pos_key = prefix + ".embed_positions.weight"
        if config.position_type == "learned" and pos_key in s:
            side["embed_positions"] = s[pos_key]
        if config.use_layernorm_embedding:
            side["layernorm_embedding"] = ln(prefix + ".layernorm_embedding")
        if config.final_layer_norm and prefix + ".layer_norm.weight" in s:
            side["layer_norm"] = ln(prefix + ".layer_norm")
        return side

    params = {
        "encoder": stack_side("encoder", config.encoder_layers, False),
        "decoder": stack_side("decoder", config.decoder_layers, True),
        "final_logits_bias": s.get(
            "final_logits_bias", np.zeros(config.vocab_size, np.float32)
        ).reshape(-1),
    }
    return params
