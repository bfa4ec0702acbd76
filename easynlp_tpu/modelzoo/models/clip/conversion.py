"""Import Chinese-CLIP / HF-CLIP torch checkpoints.

Handles the reference's main dialect (reference appzoo/clip/data.py:193-201
lists open_clip / chinese_clip / huggingface_clip): here the HF chinese-clip
layout — text_model.* is a BERT encoder, vision_model.* a pre-LN ViT with
separate q/k/v projections (fused here), plus {text,visual}_projection and
logit_scale."""

import numpy as np

from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone


def _ln(s, key):
    return {"scale": s[key + ".weight"], "bias": s[key + ".bias"]}


def _dense_t(s, key, bias=True):
    out = {"kernel": s[key + ".weight"].T}
    if bias and key + ".bias" in s:
        out["bias"] = s[key + ".bias"]
    return out


def convert_chinese_clip(state_dict, config):
    s = {k: np.asarray(v) for k, v in state_dict.items()}
    L = config.vision_config.num_hidden_layers

    # text tower: BERT under 'text_model.'
    text_state = {k[len("text_model."):]: v for k, v in s.items()
                  if k.startswith("text_model.")}
    text = convert_bert_backbone(text_state, config.text_config)
    text.pop("pooler", None)

    base = "vision_model."
    pre = base + "vision_model." if base + "vision_model.embeddings.class_embedding" in s else base

    def vl(i, sub):
        return "%sencoder.layers.%d.%s" % (pre, i, sub)

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def qkv(i):
        kernel = np.concatenate(
            [s[vl(i, "self_attn.%s_proj.weight" % n)].T for n in "qkv"], axis=1)
        bias = np.concatenate(
            [s[vl(i, "self_attn.%s_proj.bias" % n)] for n in "qkv"])
        return {"kernel": kernel, "bias": bias}

    patch_w = s[pre + "embeddings.patch_embedding.weight"]  # [E, 3, P, P]
    e, ch, p, _ = patch_w.shape
    # our patchify layout: [P, P, 3] flattened row-major → [P*P*3, E]
    patch_kernel = patch_w.transpose(2, 3, 1, 0).reshape(p * p * ch, e)

    vision = {
        "patch_embedding": {"kernel": patch_kernel},
        "class_embedding": s[pre + "embeddings.class_embedding"].reshape(-1),
        "position_embedding": s[pre + "embeddings.position_embedding.weight"],
        "pre_ln": _ln(s, pre + "pre_layrnorm") if pre + "pre_layrnorm.weight" in s
        else _ln(s, pre + "pre_layernorm"),
        "layers": {
            "ln_1": stack(lambda i: _ln(s, vl(i, "layer_norm1"))),
            "qkv": stack(qkv),
            "proj": stack(lambda i: _dense_t(s, vl(i, "self_attn.out_proj"))),
            "ln_2": stack(lambda i: _ln(s, vl(i, "layer_norm2"))),
            "fc1": stack(lambda i: _dense_t(s, vl(i, "mlp.fc1"))),
            "fc2": stack(lambda i: _dense_t(s, vl(i, "mlp.fc2"))),
        },
        "post_ln": _ln(s, pre + "post_layernorm"),
    }
    params = {
        "text_model": text,
        "vision_model": vision,
        "text_projection": {"kernel": s["text_projection.weight"].T},
        "visual_projection": {"kernel": s["visual_projection.weight"].T},
        "logit_scale": s["logit_scale"].reshape(()),
    }
    return params


def convert_openai_visual(s, config, prefix="visual."):
    """OpenAI-CLIP visual tower naming (also used by Wukong and open_clip:
    conv1/class_embedding/positional_embedding/ln_pre/transformer.resblocks.N
    /ln_post/proj) → our ViTEncoder layout."""
    L = config.vision_config.num_hidden_layers

    def rb(i, sub):
        return "%stransformer.resblocks.%d.%s" % (prefix, i, sub)

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def qkv(i):
        # in_proj stacks q|k|v on the output rows; transpose → q|k|v columns
        return {"kernel": s[rb(i, "attn.in_proj_weight")].T,
                "bias": s[rb(i, "attn.in_proj_bias")]}

    patch_w = s[prefix + "conv1.weight"]  # [E, 3, P, P], no bias
    e, ch, p, _ = patch_w.shape
    patch_kernel = patch_w.transpose(2, 3, 1, 0).reshape(p * p * ch, e)
    vision = {
        "patch_embedding": {"kernel": patch_kernel},
        "class_embedding": s[prefix + "class_embedding"].reshape(-1),
        "position_embedding": s[prefix + "positional_embedding"],
        "pre_ln": _ln(s, prefix + "ln_pre"),
        "layers": {
            "ln_1": stack(lambda i: _ln(s, rb(i, "ln_1"))),
            "qkv": stack(qkv),
            "proj": stack(lambda i: _dense_t(s, rb(i, "attn.out_proj"))),
            "ln_2": stack(lambda i: _ln(s, rb(i, "ln_2"))),
            "fc1": stack(lambda i: _dense_t(s, rb(i, "mlp.c_fc"))),
            "fc2": stack(lambda i: _dense_t(s, rb(i, "mlp.c_proj"))),
        },
        "post_ln": _ln(s, prefix + "ln_post"),
    }
    # visual.proj is used as x @ proj — no transpose
    visual_projection = {"kernel": s[prefix + "proj"]}
    return vision, visual_projection


def convert_wukong(state_dict, config):
    """Wukong dialect (reference appzoo/clip/data.py:193-201 +
    models/wukong/modeling_wukong.py:97-113: 'visual.*'+logit_scale from the
    CLIP checkpoint, 'bert.*' text tower, text_projection): → CLIPModel
    params."""
    s = {k: np.asarray(v) for k, v in state_dict.items()}
    vision, visual_projection = convert_openai_visual(s, config)
    text_state = {k[len("bert."):] if k.startswith("bert.") else k: v
                  for k, v in s.items()
                  if k.startswith("bert.") or k.startswith("encoder.")
                  or k.startswith("embeddings.")}
    text = convert_bert_backbone(text_state, config.text_config)
    text.pop("pooler", None)
    params = {
        "vision_model": vision,
        "visual_projection": visual_projection,
        "text_model": text,
    }
    if "text_projection" in s:
        params["text_projection"] = {"kernel": s["text_projection"]}
    elif "text_projection.weight" in s:
        params["text_projection"] = {"kernel": s["text_projection.weight"].T}
    if "logit_scale" in s:
        params["logit_scale"] = s["logit_scale"].reshape(())
    return params
