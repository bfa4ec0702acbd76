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
