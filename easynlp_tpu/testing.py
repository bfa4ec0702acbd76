"""Synthetic setups for benchmarks, dry runs and tests."""

import types

import numpy as np

from easynlp_tpu.modelzoo.models.bert import BertConfig


class SyntheticClassificationDataset:
    """Random fixed-shape classification batches matching the app contract."""

    def __init__(self, n, seq_len, vocab_size, num_labels=2, seed=0):
        rng = np.random.RandomState(seed)
        self.features = {
            "input_ids": rng.randint(5, vocab_size, (n, seq_len)).astype(np.int32),
            "attention_mask": np.ones((n, seq_len), np.int32),
            "token_type_ids": np.zeros((n, seq_len), np.int32),
            "label_ids": rng.randint(0, num_labels, (n,)).astype(np.int32),
        }
        self.label_mapping = {str(i): i for i in range(num_labels)}
        self.n = n

    @property
    def label_enumerate_values(self):
        return list(self.label_mapping)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {k: v[idx] for k, v in self.features.items()}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


def make_args(**overrides):
    """A minimal args namespace accepted by Trainer/Evaluator without going
    through the CLI."""
    from easynlp_tpu.utils.arguments import parse_args
    from easynlp_tpu.utils.global_vars import set_global_args
    from easynlp_tpu.utils.initializer import enable_compile_cache

    enable_compile_cache()
    args = parse_args(args_list=[])
    for k, v in overrides.items():
        setattr(args, k, v)
    set_global_args(args)
    return args


def bert_base_config(vocab_size=30522, seq_len=512):
    return BertConfig(vocab_size=vocab_size, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12,
                      intermediate_size=3072, max_position_embeddings=seq_len)


def tiny_bert_config(vocab_size=1000, **overrides):
    kw = dict(vocab_size=vocab_size, hidden_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              intermediate_size=128, max_position_embeddings=64)
    kw.update(overrides)
    return BertConfig(**kw)


def zeros_like_init(init_thunk):
    """Zero param tree shaped by `jax.eval_shape` over a flax init thunk.

    Benchmarks use this instead of eager `module.init`: flax init executes
    one dispatch per parameter (truncated_normal etc.) which costs minutes
    through a tunneled device for large models, while throughput is
    data-independent on TPU (identical dense FLOPs whatever the weights).
    Not for training/parity tests — those need the real init distribution.
    """
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from flax import linen as nn

    shapes = jax.eval_shape(init_thunk)
    variables = jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return nn.unbox(variables["params"])
