"""Checkpoint export/interop.

Capability parity: reference easynlp/utils/exporter.py (train_config.json
:25, label_mapping.json :68 — both written by core/trainer.py here; TF
checkpoint export :81-193) and utils/adapter.py (TF→pytorch import).

In this build the cross-ecosystem matrix is:
  - flax msgpack  ↔ native format (modeling_utils.save_params/load_params)
  - pytorch_model.bin → native (per-family converters, torch CPU)
  - native → pytorch_model.bin (export_pytorch_checkpoint below)
  - TF checkpoints: gated on a tensorflow install (absent in this image)
"""

import os

import jax
import numpy as np

from easynlp_tpu.utils.io_utils import io
from easynlp_tpu.utils.logger import logger


def export_pytorch_checkpoint(params, key_mapping, output_path):
    """Write a pytorch_model.bin from a params pytree.

    key_mapping: {torch_key: (path_tuple, transform)} where transform is
    None (copy) or 'T' (transpose back to torch [out, in] layout)."""
    import torch
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(jax.device_get(params))
    state = {}
    for torch_key, (path, transform) in key_mapping.items():
        arr = np.asarray(flat[tuple(path)])
        if transform == "T":
            arr = arr.T
        state[torch_key] = torch.from_numpy(np.ascontiguousarray(arr))
    torch.save(state, output_path)
    logger.info("exported %d tensors to %s", len(state), output_path)
    return output_path


def export_bert_backbone_to_pytorch(params, config, output_path,
                                    prefix="bert."):
    """Inverse of models/bert/conversion.convert_bert_backbone: unstack the
    scanned layers and split the fused QKV back into q/k/v."""
    import torch
    from flax.traverse_util import flatten_dict

    p = jax.device_get(params)
    state = {}

    def put(key, arr):
        state[prefix + key] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(arr)))

    emb = p["embeddings"]
    put("embeddings.word_embeddings.weight", emb["word_embeddings"]["embedding"])
    put("embeddings.position_embeddings.weight",
        emb["position_embeddings"]["embedding"])
    if "token_type_embeddings" in emb:
        put("embeddings.token_type_embeddings.weight",
            emb["token_type_embeddings"]["embedding"])
    put("embeddings.LayerNorm.weight", emb["LayerNorm"]["scale"])
    put("embeddings.LayerNorm.bias", emb["LayerNorm"]["bias"])

    layers = p["encoder"]["layers"]
    L = config.num_hidden_layers
    e = config.hidden_size
    for i in range(L):
        base = "encoder.layer.%d." % i
        qkv_k = layers["attention"]["qkv"]["kernel"][i]   # [E, 3E]
        qkv_b = layers["attention"]["qkv"]["bias"][i]
        for j, name in enumerate(("query", "key", "value")):
            put(base + "attention.self.%s.weight" % name,
                qkv_k[:, j * e:(j + 1) * e].T)
            put(base + "attention.self.%s.bias" % name,
                qkv_b[j * e:(j + 1) * e])
        put(base + "attention.output.dense.weight",
            layers["attention"]["output"]["kernel"][i].T)
        put(base + "attention.output.dense.bias",
            layers["attention"]["output"]["bias"][i])
        put(base + "attention.output.LayerNorm.weight",
            layers["attention_ln"]["scale"][i])
        put(base + "attention.output.LayerNorm.bias",
            layers["attention_ln"]["bias"][i])
        put(base + "intermediate.dense.weight",
            layers["intermediate"]["kernel"][i].T)
        put(base + "intermediate.dense.bias",
            layers["intermediate"]["bias"][i])
        put(base + "output.dense.weight", layers["output"]["kernel"][i].T)
        put(base + "output.dense.bias", layers["output"]["bias"][i])
        put(base + "output.LayerNorm.weight", layers["output_ln"]["scale"][i])
        put(base + "output.LayerNorm.bias", layers["output_ln"]["bias"][i])
    if "pooler" in p:
        put("pooler.dense.weight", p["pooler"]["dense"]["kernel"].T)
        put("pooler.dense.bias", p["pooler"]["dense"]["bias"])

    import torch as _torch
    _torch.save(state, output_path)
    logger.info("exported BERT backbone (%d tensors) to %s",
                len(state), output_path)
    return output_path


def export_tf_checkpoint(params, config, output_path):
    """Write a Google-BERT-named TF v1 checkpoint from our backbone params
    (reference exporter.py:81-193 serves EAS/TF deployments). Inverse of
    utils/adapter.load_bert_tf_checkpoint: unstack the scanned layers, split
    the fused QKV; TF kernels share flax's [in, out] layout."""
    import tensorflow as tf

    p = jax.device_get(params)
    tensors = {}

    def put(key, arr):
        tensors[key] = np.ascontiguousarray(np.asarray(arr))

    emb = p["embeddings"]
    put("bert/embeddings/word_embeddings",
        emb["word_embeddings"]["embedding"])
    put("bert/embeddings/position_embeddings",
        emb["position_embeddings"]["embedding"])
    if "token_type_embeddings" in emb:
        put("bert/embeddings/token_type_embeddings",
            emb["token_type_embeddings"]["embedding"])
    put("bert/embeddings/LayerNorm/gamma", emb["LayerNorm"]["scale"])
    put("bert/embeddings/LayerNorm/beta", emb["LayerNorm"]["bias"])

    layers = p["encoder"]["layers"]
    e = config.hidden_size
    for i in range(config.num_hidden_layers):
        base = "bert/encoder/layer_%d/" % i
        qkv_k = layers["attention"]["qkv"]["kernel"][i]
        qkv_b = layers["attention"]["qkv"]["bias"][i]
        for j, name in enumerate(("query", "key", "value")):
            put(base + "attention/self/%s/kernel" % name,
                qkv_k[:, j * e:(j + 1) * e])
            put(base + "attention/self/%s/bias" % name,
                qkv_b[j * e:(j + 1) * e])
        put(base + "attention/output/dense/kernel",
            layers["attention"]["output"]["kernel"][i])
        put(base + "attention/output/dense/bias",
            layers["attention"]["output"]["bias"][i])
        put(base + "attention/output/LayerNorm/gamma",
            layers["attention_ln"]["scale"][i])
        put(base + "attention/output/LayerNorm/beta",
            layers["attention_ln"]["bias"][i])
        put(base + "intermediate/dense/kernel",
            layers["intermediate"]["kernel"][i])
        put(base + "intermediate/dense/bias",
            layers["intermediate"]["bias"][i])
        put(base + "output/dense/kernel", layers["output"]["kernel"][i])
        put(base + "output/dense/bias", layers["output"]["bias"][i])
        put(base + "output/LayerNorm/gamma", layers["output_ln"]["scale"][i])
        put(base + "output/LayerNorm/beta", layers["output_ln"]["bias"][i])
    if "pooler" in p:
        put("bert/pooler/dense/kernel", p["pooler"]["dense"]["kernel"])
        put("bert/pooler/dense/bias", p["pooler"]["dense"]["bias"])

    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        for name, arr in tensors.items():
            tf1.get_variable(name, initializer=arr.astype(np.float32))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, output_path, write_meta_graph=False)
    logger.info("exported %d TF variables to %s", len(tensors), output_path)
    return output_path
