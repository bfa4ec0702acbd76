"""Synthetic tutorial fixtures: `python gen_data.py <app_name> <out_dir>`.

Writes train.tsv / dev.tsv in each app's row format plus a tiny `pretrain/`
model dir so every tutorial's run.sh works out of the box in this
zero-egress environment. For real work, point MODEL at a zoo name
(e.g. bert-base-chinese via the EASYNLP_REMOTE_MODELZOO registry) and
TRAIN_TABLE/DEV_TABLE at your data — the row formats here mirror the
reference tutorials (/root/reference/examples/appzoo_tutorials/*)."""

import base64
import io
import json
import os
import random
import sys

POS = ["good", "great", "happy", "nice", "love", "win"]
NEG = ["bad", "awful", "sad", "hate", "lose", "poor"]
FILL = ["the", "a", "it", "was", "very", "day", "thing", "time", "story"]


def _vocab(path):
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += sorted(set(POS + NEG + FILL))
    toks += list("abcdefghijklmnopqrstuvwxyz0123456789")
    with open(path, "w") as f:
        f.write("\n".join(toks) + "\n")
    return len(toks)


def _bert_pretrain(d, **config_over):
    os.makedirs(d, exist_ok=True)
    v = _vocab(os.path.join(d, "vocab.txt"))
    cfg = dict(model_type="bert", vocab_size=v, hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               intermediate_size=128, max_position_embeddings=64,
               type_vocab_size=2)
    cfg.update(config_over)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _bart_pretrain(d):
    """Byte-level BPE with no merges — valid GPT-2-tokenizer files without
    shipping a real vocab."""
    os.makedirs(d, exist_ok=True)
    from easynlp_tpu.modelzoo.models.gpt2.tokenization_gpt2 import (
        bytes_to_unicode)
    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    cfg = dict(model_type="bart", vocab_size=len(vocab), d_model=32,
               encoder_layers=1, decoder_layers=1, encoder_attention_heads=2,
               decoder_attention_heads=2, encoder_ffn_dim=64,
               decoder_ffn_dim=64, max_position_embeddings=64,
               pad_token_id=len(vocab) - 1, bos_token_id=len(vocab) - 1,
               eos_token_id=len(vocab) - 1,
               decoder_start_token_id=len(vocab) - 1,
               forced_eos_token_id=None)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _img64(seed, size=16):
    import numpy as np
    from PIL import Image
    arr = np.random.RandomState(seed).randint(0, 255, (size, size, 3),
                                              np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.urlsafe_b64encode(buf.getvalue()).decode()


def _frames64(seed, n=3):
    return json.dumps([_img64(seed * 100 + j) for j in range(n)])


def _sentence(rng, label=None):
    words = rng.choices(FILL, k=4)
    if label is not None:
        words.insert(rng.randrange(len(words)),
                     rng.choice(POS if label == "pos" else NEG))
    return " ".join(words)


def _write(path, rows):
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def _classify_rows(n, seed):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        lab = rng.choice(["pos", "neg"])
        out.append("%d\t%s\t%s" % (i, _sentence(rng, lab), lab))
    return out


def build(app, out_dir, n_train=32, n_dev=8):
    os.makedirs(out_dir, exist_ok=True)
    rngs = random.Random(1)

    def tsvs(make_row):
        _write(os.path.join(out_dir, "train.tsv"),
               [make_row(i) for i in range(n_train)])
        _write(os.path.join(out_dir, "dev.tsv"),
               [make_row(10_000 + i) for i in range(n_dev)])

    pretrain = os.path.join(out_dir, "pretrain")

    if app in ("text_classify", "geep_classify", "vectorization",
               "data_augmentation"):
        _bert_pretrain(pretrain)
        _write(os.path.join(out_dir, "train.tsv"),
               _classify_rows(n_train, 1))
        _write(os.path.join(out_dir, "dev.tsv"), _classify_rows(n_dev, 2))
    elif app == "text_match":
        _bert_pretrain(pretrain)

        def row(i):
            r = random.Random(i)
            lab = r.choice(["0", "1"])
            s1 = _sentence(r, "pos")
            s2 = s1 if lab == "1" else _sentence(r, "neg")
            return "%d\t%s\t%s\t%s" % (i, s1, s2, lab)
        tsvs(row)
    elif app == "sequence_labeling":
        _bert_pretrain(pretrain)

        def row(i):
            r = random.Random(i)
            words = r.choices(FILL, k=3) + [r.choice(POS)]
            r.shuffle(words)
            tags = ["B-KEY" if w in POS else "O" for w in words]
            return "%d\t%s\t%s" % (i, " ".join(words), " ".join(tags))
        tsvs(row)
    elif app == "language_modeling":
        _bert_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s" % (i, _sentence(random.Random(i), "pos")))
    elif app in ("sequence_generation", "open_domain_dialogue"):
        _bart_pretrain(pretrain)

        def row(i):
            r = random.Random(i)
            src = _sentence(r, "pos")
            return "%d\t%s\t%s" % (i, src, " ".join(src.split()[:2]))
        tsvs(row)
    elif app == "machine_reading_comprehension":
        _bert_pretrain(pretrain)

        def row(i):
            r = random.Random(i)
            answer = r.choice(POS)
            context = "%s %s %s" % (_sentence(r), answer, _sentence(r))
            return "%d\t%s\t%s\t%s" % (i, "which word is happy", context,
                                       answer)
        tsvs(row)
    elif app == "information_extraction":
        _bert_pretrain(pretrain)

        def row(i):
            r = random.Random(i)
            words = r.choices(FILL, k=3)
            key = r.choice(POS)
            pos = r.randrange(len(words) + 1)
            words.insert(pos, key)
            text = " ".join(words)
            start = len(" ".join(words[:pos])) + (1 if pos else 0)
            return "%d\t%s\t%d,%d,KEY" % (i, text, start, start + len(key))
        tsvs(row)
    elif app in ("clip", "wukong_clip"):
        _clip_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s\t%s" % (i, _sentence(random.Random(i), "pos"),
                                       _img64(i)))
    elif app == "text2video_retrieval":
        _clip_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s\t%s" % (i, _sentence(random.Random(i), "pos"),
                                       _frames64(i)))
    elif app == "text2image_generation":
        _artist_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s\t%s" % (i, _sentence(random.Random(i), "pos"),
                                       _img64(i)))
    elif app == "image2text_generation":
        _i2t_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s\t%s" % (i, _img64(i),
                                       _sentence(random.Random(i), "pos")))
    elif app == "video2text_generation":
        _i2t_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s\t%s" % (i, _frames64(i, 2),
                                       _sentence(random.Random(i), "pos")))
    elif app == "latent_diffusion":
        _ldm_pretrain(pretrain)
        tsvs(lambda i: "%d\t%s\t%s" % (i, _sentence(random.Random(i), "pos"),
                                       _img64(i)))
    else:
        raise SystemExit("unknown app %r" % app)
    print(out_dir)


def _clip_pretrain(d):
    os.makedirs(d, exist_ok=True)
    v = _vocab(os.path.join(d, "vocab.txt"))
    cfg = {"model_type": "clip", "projection_dim": 8,
           "text_config": {"vocab_size": v, "hidden_size": 16,
                           "num_hidden_layers": 1, "num_attention_heads": 2,
                           "intermediate_size": 32,
                           "max_position_embeddings": 32},
           "vision_config": {"image_size": 16, "patch_size": 8,
                             "hidden_size": 16, "num_hidden_layers": 1,
                             "num_attention_heads": 2,
                             "intermediate_size": 32,
                             "hidden_act": "quick_gelu"}}
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _artist_pretrain(d):
    os.makedirs(d, exist_ok=True)
    v = _vocab(os.path.join(d, "vocab.txt"))
    cfg = {"model_type": "artist", "text_vocab_size": v,
           "image_vocab_size": 32, "image_token_length": 64,
           "text_length": 8, "codebook_dim": 8, "vq_channels": 8,
           "vq_channel_mult": [1, 2], "vq_num_res_blocks": 1,
           "gpt_config": {"n_positions": 128, "n_embd": 16, "n_layer": 1,
                          "n_head": 2, "resid_pdrop": 0.0, "embd_pdrop": 0.0,
                          "attn_pdrop": 0.0}}
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _i2t_pretrain(d):
    os.makedirs(d, exist_ok=True)
    v = _vocab(os.path.join(d, "vocab.txt"))
    cfg = {"model_type": "clip_gpt_i2t",
           "vision_config": {"image_size": 16, "patch_size": 8,
                             "hidden_size": 16, "num_hidden_layers": 1,
                             "num_attention_heads": 2,
                             "intermediate_size": 32,
                             "hidden_act": "quick_gelu"},
           "gpt_config": {"vocab_size": v, "n_positions": 64, "n_embd": 16,
                          "n_layer": 1, "n_head": 2, "resid_pdrop": 0.0,
                          "embd_pdrop": 0.0, "attn_pdrop": 0.0}}
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _ldm_pretrain(d):
    os.makedirs(d, exist_ok=True)
    v = _vocab(os.path.join(d, "vocab.txt"))
    cfg = {"model_type": "latent_diffusion", "image_size": 16,
           "latent_channels": 2, "model_channels": 16,
           "channel_mult": [1, 2], "num_res_blocks": 1,
           "attention_levels": [1], "num_heads": 2, "context_dim": 16,
           "vae_channels": 8, "vae_channel_mult": [1, 2],
           "vae_num_res_blocks": 1,
           "text_config": {"vocab_size": v, "hidden_size": 16,
                           "num_hidden_layers": 1, "num_attention_heads": 2,
                           "intermediate_size": 32,
                           "max_position_embeddings": 16}}
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "./data")
