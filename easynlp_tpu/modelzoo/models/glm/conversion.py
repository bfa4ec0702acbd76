"""GLM checkpoint import: Megatron TP-sliced checkpoints + single-file GLM
torch checkpoints.

Capability parity: reference easynlp/modelzoo/mg_utils (pretrain_glm.py
save/load of mp_rank_XX model slices; mpu Column/RowParallelLinear define
the merge axes) and models/mg_glm. TPU shape: slices merge on the host into
one full state dict, then convert onto the scanned GLMModel layout — at run
time the `tensor` mesh axis re-shards the same weights, so a TP=8 Megatron
checkpoint loads onto any mesh."""

import numpy as np

_COLUMN_PARALLEL = ("attention.query_key_value", "mlp.dense_h_to_4h")
_ROW_PARALLEL = ("attention.dense", "mlp.dense_4h_to_h")
_VOCAB_PARALLEL = ("word_embeddings",)


def merge_megatron_tp_slices(slices):
    """[per-rank state dict] → one full state dict (reference mpu layout:
    ColumnParallelLinear splits the output dim → concat rows; RowParallel
    splits the input dim → concat columns; vocab-parallel embedding splits
    rows; everything else is replicated).

    query_key_value needs special handling: each rank holds its own stacked
    [q|k|v] block, so ranks merge per section, then re-stack q|k|v."""
    if len(slices) == 1:
        return dict(slices[0])
    slices = [{k: np.asarray(v) for k, v in s.items()} for s in slices]
    out = {}
    for key, first in slices[0].items():
        parts = [s[key] for s in slices]
        if "query_key_value" in key:
            sections = [np.split(p, 3, axis=0) for p in parts]  # q,k,v
            out[key] = np.concatenate(
                [np.concatenate([sec[i] for sec in sections], axis=0)
                 for i in range(3)], axis=0)
        elif any(m in key for m in _COLUMN_PARALLEL + _VOCAB_PARALLEL):
            out[key] = np.concatenate(parts, axis=0)
        elif any(m in key for m in _ROW_PARALLEL) and key.endswith(".weight"):
            out[key] = np.concatenate(parts, axis=1)
        else:
            out[key] = first  # replicated (layernorms, positions, biases
            #                   of row-parallel layers)
    return out


def convert_glm(state_dict, config):
    """Megatron-GLM state dict → our GLMModel params (fused qkv already the
    Megatron q|k|v row order; layers stacked on the scan axis)."""
    s = {}
    for k, v in state_dict.items():
        for prefix in ("glm.", "model.", "module."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        s[k.replace("transformer.", "")] = np.asarray(v)

    L = config.num_layers

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def lyr(i, name):
        return "layers.%d.%s" % (i, name)

    def dense_t(key):
        return {"kernel": s[key + ".weight"].T, "bias": s[key + ".bias"]}

    def ln(key):
        return {"scale": s[key + ".weight"], "bias": s[key + ".bias"]}

    params = {
        "word_embeddings": {"embedding": s["word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": s["position_embeddings.weight"]},
        "final_layernorm": ln("final_layernorm"),
        "layers": {
            "input_layernorm": stack(
                lambda i: ln(lyr(i, "input_layernorm"))),
            "qkv": stack(
                lambda i: dense_t(lyr(i, "attention.query_key_value"))),
            "dense": stack(lambda i: dense_t(lyr(i, "attention.dense"))),
            "post_attention_layernorm": stack(
                lambda i: ln(lyr(i, "post_attention_layernorm"))),
            "dense_h_to_4h": stack(
                lambda i: dense_t(lyr(i, "mlp.dense_h_to_4h"))),
            "dense_4h_to_h": stack(
                lambda i: dense_t(lyr(i, "mlp.dense_4h_to_h"))),
        },
    }
    if "block_position_embeddings.weight" in s:
        params["block_position_embeddings"] = {
            "embedding": s["block_position_embeddings.weight"]}
    # position tables may be shorter/longer than max_sequence_length+1
    return params


def load_megatron_glm_checkpoint(ckpt_dir, config):
    """Load a Megatron checkpoint directory (mp_rank_XX/model_optim_rng.pt
    slices, reference pretrain_glm.py save layout) → GLMModel params."""
    import glob
    import os

    import torch
    rank_files = sorted(
        glob.glob(os.path.join(ckpt_dir, "mp_rank_*", "*.pt"))
        + glob.glob(os.path.join(ckpt_dir, "mp_rank_*.pt")))
    if not rank_files:
        raise FileNotFoundError("no mp_rank_* slices under %s" % ckpt_dir)
    slices = []
    for path in rank_files:
        blob = torch.load(path, map_location="cpu", weights_only=False)
        sd = blob.get("module", blob.get("model", blob)) \
            if isinstance(blob, dict) else blob
        slices.append({k: np.asarray(v) for k, v in sd.items()
                       if hasattr(v, "shape")})
    return convert_glm(merge_megatron_tp_slices(slices), config)
