"""Import HF/reference torch GPT-2 checkpoints (Conv1D weights are already
[in, out], so no transpose — unlike BERT's nn.Linear)."""

import numpy as np


def convert_gpt2_state_dict(state_dict, config):
    s = {}
    for k, v in state_dict.items():
        k = k[len("transformer."):] if k.startswith("transformer.") else k
        s[k] = np.asarray(v)
    L = config.n_layer

    def conv1d(key):
        return {"kernel": s[key + ".weight"], "bias": s[key + ".bias"]}

    def ln(key):
        return {"scale": s[key + ".weight"], "bias": s[key + ".bias"]}

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    transformer = {
        "wte": {"embedding": s["wte.weight"]},
        "wpe": {"embedding": s["wpe.weight"]},
        "h": {
            "ln_1": stack(lambda i: ln("h.%d.ln_1" % i)),
            "attn": {
                "c_attn": stack(lambda i: conv1d("h.%d.attn.c_attn" % i)),
                "c_proj": stack(lambda i: conv1d("h.%d.attn.c_proj" % i)),
            },
            "ln_2": stack(lambda i: ln("h.%d.ln_2" % i)),
            "c_fc": stack(lambda i: conv1d("h.%d.mlp.c_fc" % i)),
            "c_proj": stack(lambda i: conv1d("h.%d.mlp.c_proj" % i)),
        },
        "ln_f": ln("ln_f"),
    }
    return {"transformer": transformer}
