"""Import HF/reference torch T5 checkpoints into the scanned layout."""

import numpy as np


def convert_t5_state_dict(state_dict, config):
    s = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(key):
        return {"kernel": s[key + ".weight"].T}

    def ln(key):
        return {"scale": s[key + ".weight"]}

    def stack(keys_fn, n):
        per = [keys_fn(i) for i in range(n)]
        return _stack_tree(per)

    def _stack_tree(per):
        out = {}
        for k in per[0]:
            if isinstance(per[0][k], dict):
                out[k] = _stack_tree([p[k] for p in per])
            else:
                out[k] = np.stack([p[k] for p in per])
        return out

    def block(prefix, i, is_decoder):
        base = "%s.block.%d.layer." % (prefix, i)
        self_attn = {
            "q": dense(base + "0.SelfAttention.q"),
            "k": dense(base + "0.SelfAttention.k"),
            "v": dense(base + "0.SelfAttention.v"),
            "o": dense(base + "0.SelfAttention.o"),
        }
        out = {"ln_self": ln(base + "0.layer_norm"), "self_attn": self_attn}
        ff_idx = 1
        if is_decoder:
            out["cross_attn"] = {
                "q": dense(base + "1.EncDecAttention.q"),
                "k": dense(base + "1.EncDecAttention.k"),
                "v": dense(base + "1.EncDecAttention.v"),
                "o": dense(base + "1.EncDecAttention.o"),
            }
            out["ln_cross"] = ln(base + "1.layer_norm")
            ff_idx = 2
        ff_base = base + "%d.DenseReluDense." % ff_idx
        if config.is_gated_act:
            ffn = {"wi_0": dense(ff_base + "wi_0"),
                   "wi_1": dense(ff_base + "wi_1"),
                   "wo": dense(ff_base + "wo")}
        else:
            ffn = {"wi": dense(ff_base + "wi"), "wo": dense(ff_base + "wo")}
        out["ffn"] = ffn
        out["ln_ff"] = ln(base + "%d.layer_norm" % ff_idx)
        return out

    params = {
        "shared": {"embedding": s["shared.weight"]},
        "encoder": {
            "rel_bias": {"rel_embedding": s[
                "encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"]},
            "layers": stack(lambda i: block("encoder", i, False),
                            config.num_layers),
            "final_ln": ln("encoder.final_layer_norm"),
        },
        "decoder": {
            "rel_bias": {"rel_embedding": s[
                "decoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"]},
            "layers": stack(lambda i: block("decoder", i, True),
                            config.num_decoder_layers),
            "final_ln": ln("decoder.final_layer_norm"),
        },
    }
    if not config.tie_word_embeddings and "lm_head.weight" in s:
        params["lm_head"] = {"kernel": s["lm_head.weight"].T}
    return params
