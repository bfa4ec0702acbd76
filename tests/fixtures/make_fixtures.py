"""Build tiny fixtures: a small random 'pretrained' BERT dir + a separable
2-class TSV dataset (keyword-determined labels so 1 epoch is learnable)."""

import json
import os
import random

POS_WORDS = ["good", "great", "happy", "nice", "love", "win"]
NEG_WORDS = ["bad", "awful", "sad", "hate", "lose", "poor"]
FILLER = ["the", "a", "it", "was", "very", "day", "thing", "time", "story"]


def make_vocab(path):
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += sorted(set(POS_WORDS + NEG_WORDS + FILLER))
    tokens += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    tokens += [c for c in "abcdefghijklmnopqrstuvwxyz" if c not in tokens]
    with open(path, "w") as f:
        f.write("\n".join(tokens) + "\n")
    return len(tokens)


def make_pretrained(model_dir):
    os.makedirs(model_dir, exist_ok=True)
    vocab_size = make_vocab(os.path.join(model_dir, "vocab.txt"))
    config = {
        "model_type": "bert",
        "vocab_size": vocab_size,
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "max_position_embeddings": 64,
        "type_vocab_size": 2,
        "hidden_dropout_prob": 0.1,
        "attention_probs_dropout_prob": 0.1,
        "layer_norm_eps": 1e-12,
        "initializer_range": 0.02,
        "hidden_act": "gelu",
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return model_dir


def make_tsv(path, n, seed=0):
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            label = rng.choice(["pos", "neg"])
            words = rng.choices(FILLER, k=4)
            key = rng.choice(POS_WORDS if label == "pos" else NEG_WORDS)
            words.insert(rng.randrange(len(words)), key)
            f.write("%d\t%s\t%s\n" % (i, " ".join(words), label))
    return path


def make_image_b64(seed=0, size=16):
    """Tiny random RGB PNG as urlsafe base64 (vision-app row format)."""
    import base64
    import io

    import numpy as np
    from PIL import Image
    arr = np.random.RandomState(seed).randint(0, 255, (size, size, 3),
                                              np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.urlsafe_b64encode(buf.getvalue()).decode("utf-8")


def make_caption(rng):
    return " ".join(rng.choices(FILLER + POS_WORDS, k=4))


def make_vision_tsvs(base, n_train=16, n_dev=8):
    """TSV fixtures for the 5 vision apps (reference row formats)."""
    import json
    rng = random.Random(7)

    def rows(n, make_row):
        return "\n".join(make_row(i) for i in range(n)) + "\n"

    img = lambda i: make_image_b64(seed=i)
    frames = lambda i: json.dumps([make_image_b64(seed=100 * i + j)
                                   for j in range(3)])
    specs = {
        # app -> (filename prefix, row builder)
        "t2i": lambda i: "%d\t%s\t%s" % (i, make_caption(rng), img(i)),
        "i2t": lambda i: "%d\t%s\t%s" % (i, img(i), make_caption(rng)),
        "v2t": lambda i: "%d\t%s\t%s" % (i, frames(i), make_caption(rng)),
        "t2v": lambda i: "%d\t%s\t%s" % (i, make_caption(rng), frames(i)),
        "clip": lambda i: "%d\t%s\t%s" % (i, make_caption(rng), img(i)),
    }
    for name, make_row in specs.items():
        with open(os.path.join(base, "%s_train.tsv" % name), "w") as f:
            f.write(rows(n_train, make_row))
        with open(os.path.join(base, "%s_dev.tsv" % name), "w") as f:
            f.write(rows(n_dev, make_row))


def make_vision_pretrained(base):
    """Config-only pretrain dirs for ARTIST / CLIP-GPT / CLIP tiny models."""
    vocab_sizes = {}
    vision_tiny = dict(image_size=16, patch_size=8, hidden_size=16,
                       num_hidden_layers=1, num_attention_heads=2,
                       intermediate_size=32, hidden_act="quick_gelu")

    def write(model_dir, config):
        os.makedirs(model_dir, exist_ok=True)
        v = make_vocab(os.path.join(model_dir, "vocab.txt"))
        vocab_sizes[model_dir] = v
        for key in ("text_vocab_size",):
            if key in config:
                config[key] = v
        if "gpt_config" in config and config["gpt_config"].get(
                "vocab_size") == "VOCAB":
            config["gpt_config"]["vocab_size"] = v
        if "text_config" in config and config["text_config"].get(
                "vocab_size") == "VOCAB":
            config["text_config"]["vocab_size"] = v
        with open(os.path.join(model_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2)

    write(os.path.join(base, "tiny-artist"), {
        "model_type": "artist",
        "text_vocab_size": 0,  # patched to the vocab size
        "image_vocab_size": 32,
        "image_token_length": 64,   # 16px / 2 downsample = 8x8 codes
        "text_length": 8,
        "codebook_dim": 8,
        "vq_channels": 8,
        "vq_channel_mult": [1, 2],
        "vq_num_res_blocks": 1,
        "gpt_config": {"n_positions": 128, "n_embd": 16,
                       "n_layer": 1, "n_head": 2, "resid_pdrop": 0.0,
                       "embd_pdrop": 0.0, "attn_pdrop": 0.0},
    })
    write(os.path.join(base, "tiny-i2t"), {
        "model_type": "clip_gpt_i2t",
        "vision_config": vision_tiny,
        "gpt_config": {"vocab_size": "VOCAB", "n_positions": 64, "n_embd": 16,
                       "n_layer": 1, "n_head": 2, "resid_pdrop": 0.0,
                       "embd_pdrop": 0.0, "attn_pdrop": 0.0},
    })
    write(os.path.join(base, "tiny-clip"), {
        "model_type": "clip",
        "projection_dim": 8,
        "text_config": {"vocab_size": "VOCAB", "hidden_size": 16,
                        "num_hidden_layers": 1, "num_attention_heads": 2,
                        "intermediate_size": 32,
                        "max_position_embeddings": 32},
        "vision_config": vision_tiny,
    })
    return vocab_sizes


def build_all(base):
    os.makedirs(base, exist_ok=True)
    make_pretrained(os.path.join(base, "tiny-bert"))
    make_tsv(os.path.join(base, "train.tsv"), 256, seed=1)
    make_tsv(os.path.join(base, "dev.tsv"), 64, seed=2)
    return base


if __name__ == "__main__":
    import sys
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/easynlp_fixtures"
    build_all(base)
    print(base)


def make_gpt2_ckpt(ckpt):
    """Servable tiny GPT-2 checkpoint for the continuous-batching serve
    path: byte-level BPE tokenizer files (no merges), config, initialized
    flax params."""
    os.makedirs(ckpt, exist_ok=True)
    from easynlp_tpu.modelzoo.models.gpt2.tokenization_gpt2 import (
        bytes_to_unicode)
    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(ckpt, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(ckpt, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    cfg = dict(model_type="gpt2", vocab_size=len(vocab), n_positions=64,
               n_embd=32, n_layer=2, n_head=2, resid_pdrop=0.0,
               embd_pdrop=0.0, attn_pdrop=0.0,
               eos_token_id=len(vocab) - 1)
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(cfg, f)

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from easynlp_tpu.modelzoo.modeling_utils import save_params
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    module = GPT2LMHeadModel.from_config(GPT2Config(**cfg),
                                         dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = module.init({"params": rng, "dropout": rng},
                         input_ids=jnp.ones((1, 4), jnp.int32),
                         deterministic=True)["params"]
    save_params(nn.unbox(params), ckpt)
    return ckpt


def make_bart_ckpt(ckpt, user_defined_parameters=""):
    """Servable tiny BART sequence_generation checkpoint: byte-level BPE
    tokenizer files (no merges), config, initialized params, train_config."""
    os.makedirs(ckpt, exist_ok=True)
    from easynlp_tpu.modelzoo.models.gpt2.tokenization_gpt2 import (
        bytes_to_unicode)
    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(ckpt, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(ckpt, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    special = len(vocab) - 1
    cfg = dict(model_type="bart", vocab_size=len(vocab), d_model=32,
               encoder_layers=1, decoder_layers=1, encoder_attention_heads=2,
               decoder_attention_heads=2, encoder_ffn_dim=64,
               decoder_ffn_dim=64, max_position_embeddings=64,
               pad_token_id=special, bos_token_id=special,
               eos_token_id=special, decoder_start_token_id=special,
               forced_eos_token_id=None)
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(ckpt, "train_config.json"), "w") as f:
        json.dump({"app_name": "sequence_generation",
                   "user_defined_parameters": user_defined_parameters}, f)

    import jax.numpy as jnp

    from easynlp_tpu.appzoo.sequence_generation.model import (
        SequenceGeneration)
    from easynlp_tpu.modelzoo.modeling_utils import save_params
    from easynlp_tpu.modelzoo.models.auto import AutoConfig
    config = AutoConfig.from_pretrained(ckpt)
    module = SequenceGeneration.build_module(config, dtype=jnp.float32)
    params = SequenceGeneration.init_params(module, config)
    save_params(params, ckpt)
    return ckpt
