"""TF checkpoint adapter.

Capability parity: reference easynlp/utils/adapter.py:25-296
(load_bert_tf_checkpoint_weights — Google-BERT TF v1 checkpoints → model
weights, skipping optimizer slots). Same variable-name dialect here
(bert/encoder/layer_N/attention/self/query/kernel …); TF kernels are already
[in, out] like flax, so conversion is fuse-QKV + stack-layers only."""

import numpy as np

from easynlp_tpu.utils.logger import logger


def load_bert_tf_checkpoint(tf_checkpoint_path, config):
    """Google-BERT TF checkpoint → our BertModel backbone params pytree."""
    import tensorflow as tf

    variables = {}
    for name, _ in tf.train.list_variables(tf_checkpoint_path):
        if "Adam" in name or "adam_" in name or "global_step" in name \
                or "beta1_power" in name or "beta2_power" in name:
            continue  # optimizer slots (reference adapter.py:70-74)
        variables[name] = np.asarray(
            tf.train.load_variable(tf_checkpoint_path, name))
    logger.info("TF checkpoint: %d variables from %s", len(variables),
                tf_checkpoint_path)

    def ln(key):
        return {"scale": variables[key + "/gamma"],
                "bias": variables[key + "/beta"]}

    def dense(key):
        return {"kernel": variables[key + "/kernel"],
                "bias": variables[key + "/bias"]}

    p = {"embeddings": {
        "word_embeddings": {
            "embedding": variables["bert/embeddings/word_embeddings"]},
        "position_embeddings": {
            "embedding": variables["bert/embeddings/position_embeddings"]},
        "LayerNorm": ln("bert/embeddings/LayerNorm"),
    }}
    if "bert/embeddings/token_type_embeddings" in variables:
        p["embeddings"]["token_type_embeddings"] = {
            "embedding": variables["bert/embeddings/token_type_embeddings"]}

    L = config.num_hidden_layers

    def stack(fn):
        per = [fn(i) for i in range(L)]
        return {k: np.stack([x[k] for x in per]) for k in per[0]}

    def qkv(i):
        base = "bert/encoder/layer_%d/attention/self/" % i
        kernel = np.concatenate(
            [variables[base + n + "/kernel"] for n in ("query", "key",
                                                       "value")], axis=1)
        bias = np.concatenate(
            [variables[base + n + "/bias"] for n in ("query", "key",
                                                     "value")])
        return {"kernel": kernel, "bias": bias}

    def lyr(i, key):
        return "bert/encoder/layer_%d/%s" % (i, key)

    p["encoder"] = {"layers": {
        "attention": {
            "qkv": stack(qkv),
            "output": stack(lambda i: dense(lyr(i, "attention/output/dense"))),
        },
        "attention_ln": stack(
            lambda i: ln(lyr(i, "attention/output/LayerNorm"))),
        "intermediate": stack(lambda i: dense(lyr(i, "intermediate/dense"))),
        "output": stack(lambda i: dense(lyr(i, "output/dense"))),
        "output_ln": stack(lambda i: ln(lyr(i, "output/LayerNorm"))),
    }}
    if "bert/pooler/dense/kernel" in variables:
        p["pooler"] = {"dense": dense("bert/pooler/dense")}
    return p
