"""Stable-Diffusion / PAI-Diffusion checkpoint import.

Capability parity: reference easynlp/appzoo/latent_diffusion/model.py:144-287
loads CompVis-format `.ckpt` state dicts (model.diffusion_model.* UNet,
first_stage_model.* AutoencoderKL, cond_stage_model.* text encoder) — this
module maps that naming onto the TPU modules in unet.py / autoencoder.py:

- torch OIHW conv kernels → flax HWIO; 1×1 convs feeding flattened grids
  (SpatialTransformer proj_in/out) → Dense kernels;
- separate to_q/to_k/to_v → the fused attn1_qkv / attn2_kv column concat;
- GEGLU half order: torch computes x * gelu(gate) with chunks [x, gate],
  ours gelu(g1) * g2 — halves swap on conversion;
- SD input/output_blocks index arithmetic → the named down_%d_res%d /
  up_%d_res%d ladder.
"""

import numpy as np


def _c(w):
    """Conv OIHW → HWIO."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def _conv(s, key):
    return {"kernel": _c(s[key + ".weight"]), "bias": s[key + ".bias"]}


def _dense_from_conv1(s, key):
    """1×1 conv applied to a flattened grid → Dense."""
    w = np.asarray(s[key + ".weight"])[:, :, 0, 0]  # [O, I]
    return {"kernel": w.T, "bias": s[key + ".bias"]}


def _dense(s, key, bias=True):
    out = {"kernel": np.asarray(s[key + ".weight"]).T}
    if bias and key + ".bias" in s:
        out["bias"] = s[key + ".bias"]
    return out


def _gn(s, key):
    return {"scale": s[key + ".weight"], "bias": s[key + ".bias"]}


def _strip(state_dict, prefix):
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = np.asarray(v)
    if not out:  # already unprefixed
        out = {k: np.asarray(v) for k, v in state_dict.items()}
    return out


def _resblock(s, base, names=("in_layers.0", "in_layers.2", "emb_layers.1",
                              "out_layers.0", "out_layers.3",
                              "skip_connection")):
    out = {
        "norm1": _gn(s, base + names[0]),
        "conv1": _conv(s, base + names[1]),
        "temb_proj": _dense(s, base + names[2]),
        "norm2": _gn(s, base + names[3]),
        "conv2": _conv(s, base + names[4]),
    }
    if base + names[5] + ".weight" in s:
        out["skip"] = _conv(s, base + names[5])
    return out


def _vae_resblock(s, base):
    out = {
        "norm1": _gn(s, base + "norm1"),
        "conv1": _conv(s, base + "conv1"),
        "norm2": _gn(s, base + "norm2"),
        "conv2": _conv(s, base + "conv2"),
    }
    if base + "nin_shortcut.weight" in s:
        out["skip"] = _conv(s, base + "nin_shortcut")
    return out


def _vae_attn(s, base):
    return {"norm": _gn(s, base + "norm"),
            "q": _conv(s, base + "q"),
            "k": _conv(s, base + "k"),
            "v": _conv(s, base + "v"),
            "proj_out": _conv(s, base + "proj_out")}


def _spatial_transformer(s, base):
    """SD SpatialTransformer → our fused layout."""
    tb = base + "transformer_blocks.0."
    q1 = np.asarray(s[tb + "attn1.to_q.weight"]).T
    k1 = np.asarray(s[tb + "attn1.to_k.weight"]).T
    v1 = np.asarray(s[tb + "attn1.to_v.weight"]).T
    k2 = np.asarray(s[tb + "attn2.to_k.weight"]).T
    v2 = np.asarray(s[tb + "attn2.to_v.weight"]).T
    # GEGLU: torch chunks [x, gate], computes x * gelu(gate); ours is
    # gelu(g1) * g2 → g1 = gate half, g2 = x half
    ff_w = np.asarray(s[tb + "ff.net.0.proj.weight"]).T  # [C, 8C]
    ff_b = np.asarray(s[tb + "ff.net.0.proj.bias"])
    half = ff_w.shape[1] // 2
    ff_w = np.concatenate([ff_w[:, half:], ff_w[:, :half]], axis=1)
    ff_b = np.concatenate([ff_b[half:], ff_b[:half]])
    return {
        "norm": _gn(s, base + "norm"),
        "proj_in": _dense_from_conv1(s, base + "proj_in")
        if s.get(base + "proj_in.weight") is not None
        and np.asarray(s[base + "proj_in.weight"]).ndim == 4
        else _dense(s, base + "proj_in"),
        "ln1": {"scale": s[tb + "norm1.weight"], "bias": s[tb + "norm1.bias"]},
        "attn1_qkv": {"kernel": np.concatenate([q1, k1, v1], axis=1)},
        "attn1_out": _dense(s, tb + "attn1.to_out.0"),
        "ln2": {"scale": s[tb + "norm2.weight"], "bias": s[tb + "norm2.bias"]},
        "attn2_q": {"kernel": np.asarray(s[tb + "attn2.to_q.weight"]).T},
        "attn2_kv": {"kernel": np.concatenate([k2, v2], axis=1)},
        "attn2_out": _dense(s, tb + "attn2.to_out.0"),
        "ln3": {"scale": s[tb + "norm3.weight"], "bias": s[tb + "norm3.bias"]},
        "mlp_in": {"kernel": ff_w, "bias": ff_b},
        "mlp_out": _dense(s, tb + "ff.net.2"),
        "proj_out": _dense_from_conv1(s, base + "proj_out")
        if np.asarray(s[base + "proj_out.weight"]).ndim == 4
        else _dense(s, base + "proj_out"),
    }


def convert_sd_unet(state_dict, config):
    """model.diffusion_model.* → UNetModel params."""
    s = _strip(state_dict, "model.diffusion_model.")
    p = {
        "temb_dense1": _dense(s, "time_embed.0"),
        "temb_dense2": _dense(s, "time_embed.2"),
        "conv_in": _conv(s, "input_blocks.0.0"),
        "norm_out": _gn(s, "out.0"),
        "conv_out": _conv(s, "out.2"),
        "mid_res1": _resblock(s, "middle_block.0."),
        "mid_attn": _spatial_transformer(s, "middle_block.1."),
        "mid_res2": _resblock(s, "middle_block.2."),
    }
    idx = 1
    for level in range(len(config.channel_mult)):
        for blk in range(config.num_res_blocks):
            base = "input_blocks.%d." % idx
            p["down_%d_res%d" % (level, blk)] = _resblock(s, base + "0.")
            if level in config.attention_levels:
                p["down_%d_attn%d" % (level, blk)] = \
                    _spatial_transformer(s, base + "1.")
            idx += 1
        if level < len(config.channel_mult) - 1:
            p["down_%d_ds" % level] = _conv(
                s, "input_blocks.%d.0.op" % idx)
            idx += 1
    idx = 0
    for level in reversed(range(len(config.channel_mult))):
        for blk in range(config.num_res_blocks + 1):
            base = "output_blocks.%d." % idx
            p["up_%d_res%d" % (level, blk)] = _resblock(s, base + "0.")
            sub = 1
            if level in config.attention_levels:
                p["up_%d_attn%d" % (level, blk)] = \
                    _spatial_transformer(s, base + "%d." % sub)
                sub += 1
            if level > 0 and blk == config.num_res_blocks:
                p["up_%d_us" % level] = _conv(
                    s, base + "%d.conv" % sub)
            idx += 1
    return p


def convert_sd_vae(state_dict, config):
    """first_stage_model.* → (vae_encoder, vae_decoder) params."""
    s = _strip(state_dict, "first_stage_model.")
    levels = len(config.vae_channel_mult)
    enc = {
        "conv_in": _conv(s, "encoder.conv_in"),
        "mid_res1": _vae_resblock(s, "encoder.mid.block_1."),
        "mid_attn": _vae_attn(s, "encoder.mid.attn_1."),
        "mid_res2": _vae_resblock(s, "encoder.mid.block_2."),
        "norm_out": _gn(s, "encoder.norm_out"),
        "conv_out": _conv(s, "encoder.conv_out"),
        "quant_conv": _conv(s, "quant_conv"),
    }
    for level in range(levels):
        for blk in range(config.vae_num_res_blocks):
            enc["down_%d_res%d" % (level, blk)] = _vae_resblock(
                s, "encoder.down.%d.block.%d." % (level, blk))
        key = "encoder.down.%d.downsample.conv" % level
        if key + ".weight" in s:
            enc["down_%d_ds" % level] = _conv(s, key)
    dec = {
        "post_quant_conv": _conv(s, "post_quant_conv"),
        "conv_in": _conv(s, "decoder.conv_in"),
        "mid_res1": _vae_resblock(s, "decoder.mid.block_1."),
        "mid_attn": _vae_attn(s, "decoder.mid.attn_1."),
        "mid_res2": _vae_resblock(s, "decoder.mid.block_2."),
        "norm_out": _gn(s, "decoder.norm_out"),
        "conv_out": _conv(s, "decoder.conv_out"),
    }
    for level in range(levels):
        for blk in range(config.vae_num_res_blocks + 1):
            dec["up_%d_res%d" % (level, blk)] = _vae_resblock(
                s, "decoder.up.%d.block.%d." % (level, blk))
        key = "decoder.up.%d.upsample.conv" % level
        if key + ".weight" in s:
            dec["up_%d_us" % level] = _conv(s, key)
    return enc, dec


def convert_controlnet(state_dict, config):
    """ControlNet checkpoint (lllyasviel/CompVis layout, `control_model.*`
    keys — the dialect the reference's chinese_sd_webui `Chinese_Controlnet`
    models ship in when exported from sd-webui) → ControlNetModel params.

    The encoder clone reuses the exact same input_blocks/middle_block
    mapping as `convert_sd_unet`; on top of that:
      input_hint_block.{0,2,..,14}  → hint_conv_0..6 + hint_conv_out
      zero_convs.N.0                → zero_conv_N
      middle_block_out.0            → mid_out
    """
    s = _strip(state_dict, "control_model.")
    p = {
        "temb_dense1": _dense(s, "time_embed.0"),
        "temb_dense2": _dense(s, "time_embed.2"),
        "conv_in": _conv(s, "input_blocks.0.0"),
        "mid_res1": _resblock(s, "middle_block.0."),
        "mid_attn": _spatial_transformer(s, "middle_block.1."),
        "mid_res2": _resblock(s, "middle_block.2."),
        "mid_out": _conv(s, "middle_block_out.0"),
    }
    for i in range(7):
        p["hint_conv_%d" % i] = _conv(s, "input_hint_block.%d" % (2 * i))
    p["hint_conv_out"] = _conv(s, "input_hint_block.14")
    idx = 1
    zi = 1
    for level in range(len(config.channel_mult)):
        for blk in range(config.num_res_blocks):
            base = "input_blocks.%d." % idx
            p["down_%d_res%d" % (level, blk)] = _resblock(s, base + "0.")
            if level in config.attention_levels:
                p["down_%d_attn%d" % (level, blk)] = \
                    _spatial_transformer(s, base + "1.")
            p["zero_conv_%d" % zi] = _conv(s, "zero_convs.%d.0" % zi)
            idx += 1
            zi += 1
        if level < len(config.channel_mult) - 1:
            p["down_%d_ds" % level] = _conv(s, "input_blocks.%d.0.op" % idx)
            p["zero_conv_%d" % zi] = _conv(s, "zero_convs.%d.0" % zi)
            idx += 1
            zi += 1
    p["zero_conv_0"] = _conv(s, "zero_convs.0.0")
    return p


def convert_stable_diffusion(state_dict, config):
    """Full CompVis/PAI-Diffusion state dict → LDMModule params. The text
    encoder (cond_stage_model) converts through the BERT backbone mapping
    (PAI-Diffusion's Chinese text encoder is a BERT; CLIP text towers need
    the clip converter instead)."""
    params = {"unet": convert_sd_unet(state_dict, config)}
    enc, dec = convert_sd_vae(state_dict, config)
    params["vae_encoder"] = enc
    params["vae_decoder"] = dec
    text_sd = {}
    for k, v in state_dict.items():
        for prefix in ("cond_stage_model.transformer.",
                       "cond_stage_model.model.", "cond_stage_model."):
            if k.startswith(prefix):
                text_sd[k[len(prefix):]] = v
                break
    if text_sd:
        from easynlp_tpu.modelzoo.models.bert.conversion import (
            convert_bert_backbone)
        try:
            params["text_encoder"] = convert_bert_backbone(
                text_sd, config.text_config)
        except KeyError:
            pass  # non-BERT text tower: load separately
    return params
