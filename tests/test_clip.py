import base64
import io as _io
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
from make_fixtures import make_pretrained  # noqa: E402

from easynlp_tpu.testing import make_args

TEXT_CFG = dict(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=64, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0)
VISION_CFG = dict(image_size=32, patch_size=8, hidden_size=24,
                  num_hidden_layers=2, num_attention_heads=2,
                  intermediate_size=48, hidden_act="quick_gelu")


def _b64_png(seed, size=40):
    from PIL import Image
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_clip_parity_vs_torch():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    tcfg = transformers.ChineseCLIPTextConfig(**TEXT_CFG)
    vcfg = transformers.ChineseCLIPVisionConfig(
        **{k: v for k, v in VISION_CFG.items() if k != "hidden_act"},
        attention_dropout=0.0, hidden_act="quick_gelu")
    hf_cfg = transformers.ChineseCLIPConfig(
        text_config=tcfg.to_dict(), vision_config=vcfg.to_dict(),
        projection_dim=16)
    torch.manual_seed(0)
    hf = transformers.ChineseCLIPModel(hf_cfg).eval()

    from easynlp_tpu.modelzoo.models.clip import CLIPConfig, CLIPModel
    from easynlp_tpu.modelzoo.models.clip.conversion import (
        convert_chinese_clip)
    cfg = CLIPConfig(text_config=TEXT_CFG, vision_config=VISION_CFG,
                     projection_dim=16)
    m = CLIPModel.from_config(cfg, dtype=jnp.float32)
    params = convert_chinese_clip(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(0).randint(0, 120, (3, 10))
    mask = np.ones((3, 10), np.int64)
    pix = np.random.RandomState(1).rand(3, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pix.transpose(0, 3, 1, 2)))
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  attention_mask=jnp.asarray(mask),
                  pixel_values=jnp.asarray(pix), deterministic=True)
    np.testing.assert_allclose(np.asarray(out["text_embeds"]),
                               ref.text_embeds.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["image_embeds"]),
                               ref.image_embeds.numpy(), atol=2e-4)


def test_clip_dataset_and_loss(tmp_path):
    make_args()
    model_dir = make_pretrained(str(tmp_path / "tiny-bert"))
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    tok = BertTokenizer.from_pretrained(model_dir)
    path = str(tmp_path / "clip.tsv")
    with open(path, "w") as f:
        for i in range(4):
            f.write("a good day %d\t%s\n" % (i, _b64_png(i)))
    from easynlp_tpu.appzoo.clip.data import CLIPDataset
    ds = CLIPDataset(path, tok, max_seq_length=16,
                     input_schema="text:str:1,image:str:1",
                     first_sequence="text", second_sequence="image",
                     image_size=32)
    batch = ds.batch_fn([ds[i] for i in range(4)])
    assert batch["pixel_values"].shape == (4, 32, 32, 3)

    from easynlp_tpu.modelzoo.models.clip import CLIPConfig, CLIPModel
    from easynlp_tpu.appzoo.clip.model import CLIPApp
    cfg = CLIPConfig(
        text_config=dict(TEXT_CFG, vocab_size=tok.vocab_size),
        vision_config=VISION_CFG, projection_dim=16)
    module = CLIPModel.from_config(cfg, dtype=jnp.float32)
    params = CLIPApp.init_params(module, cfg)
    app = CLIPApp(module, params, cfg)
    out = app.forward(batch)
    assert out["logits_per_text"].shape == (4, 4)
    loss = CLIPApp.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_clip_webdataset_tar(tmp_path):
    """webdataset .tar shards: image+caption members paired by stem
    (reference clip/data.py:203-216)."""
    import io
    import json
    import tarfile

    from PIL import Image

    from easynlp_tpu.appzoo.clip.data import CLIPDataset
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer

    tar_path = str(tmp_path / "shard-000.tar")
    with tarfile.open(tar_path, "w") as tf:
        for i in range(6):
            arr = (np.random.RandomState(i).rand(10, 10, 3)
                   * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo("%05d.png" % i)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = json.dumps({"caption": "picture %d" % i}).encode() \
                if i % 2 else ("caption %d" % i).encode()
            info = tarfile.TarInfo("%05d.json" % i if i % 2
                                   else "%05d.txt" % i)
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))

    vocab = str(tmp_path / "v.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "picture", "caption"] + [str(i) for i in range(8)]))
    ds = CLIPDataset(tar_path, BertTokenizer(vocab), max_seq_length=8,
                     image_size=16)
    assert len(ds) == 6
    ex = ds[1]
    assert ex["pixel_values"].shape == (16, 16, 3)
    assert ex["input_ids"].shape == (8,)
    # process sharding splits samples of a single tar
    half = CLIPDataset(tar_path, BertTokenizer(vocab), max_seq_length=8,
                       image_size=16, process_index=1, num_processes=2)
    assert len(half) == 3


def test_wukong_dialect_conversion():
    """Wukong 'visual.*'+'bert.*' checkpoints map onto CLIPModel with the
    right shapes (reference wukong restore_model :97-113)."""
    import jax

    from easynlp_tpu.appzoo.wukong_clip.model import WukongCLIP
    from easynlp_tpu.modelzoo.models.clip import CLIPConfig

    cfg = CLIPConfig(text_config=TEXT_CFG, vision_config=VISION_CFG,
                     projection_dim=16)
    module = WukongCLIP.build_module(cfg, dtype=jnp.float32)
    ref = WukongCLIP.init_params(module, cfg)

    rng = np.random.RandomState(0)
    s = {}
    E = VISION_CFG["hidden_size"]
    P = VISION_CFG["patch_size"]
    L = VISION_CFG["num_hidden_layers"]
    n_patches = (VISION_CFG["image_size"] // P) ** 2
    s["visual.conv1.weight"] = rng.randn(E, 3, P, P).astype(np.float32)
    s["visual.class_embedding"] = rng.randn(E).astype(np.float32)
    s["visual.positional_embedding"] = rng.randn(
        n_patches + 1, E).astype(np.float32)
    for key in ("visual.ln_pre", "visual.ln_post"):
        s[key + ".weight"] = np.ones(E, np.float32)
        s[key + ".bias"] = np.zeros(E, np.float32)
    for i in range(L):
        b = "visual.transformer.resblocks.%d." % i
        s[b + "attn.in_proj_weight"] = rng.randn(3 * E, E).astype(np.float32)
        s[b + "attn.in_proj_bias"] = rng.randn(3 * E).astype(np.float32)
        s[b + "attn.out_proj.weight"] = rng.randn(E, E).astype(np.float32)
        s[b + "attn.out_proj.bias"] = np.zeros(E, np.float32)
        for ln in ("ln_1", "ln_2"):
            s[b + ln + ".weight"] = np.ones(E, np.float32)
            s[b + ln + ".bias"] = np.zeros(E, np.float32)
        s[b + "mlp.c_fc.weight"] = rng.randn(
            VISION_CFG["intermediate_size"], E).astype(np.float32)
        s[b + "mlp.c_fc.bias"] = np.zeros(
            VISION_CFG["intermediate_size"], np.float32)
        s[b + "mlp.c_proj.weight"] = rng.randn(
            E, VISION_CFG["intermediate_size"]).astype(np.float32)
        s[b + "mlp.c_proj.bias"] = np.zeros(E, np.float32)
    s["visual.proj"] = rng.randn(E, 16).astype(np.float32)
    s["logit_scale"] = np.asarray(2.0, np.float32)
    # bert text tower (reference loads a separate bert_state_dict; combined
    # here under 'bert.')
    H = TEXT_CFG["hidden_size"]
    s["bert.embeddings.word_embeddings.weight"] = rng.randn(
        TEXT_CFG["vocab_size"], H).astype(np.float32)
    s["bert.embeddings.position_embeddings.weight"] = rng.randn(
        TEXT_CFG["max_position_embeddings"], H).astype(np.float32)
    s["bert.embeddings.token_type_embeddings.weight"] = rng.randn(
        2, H).astype(np.float32)
    s["bert.embeddings.LayerNorm.weight"] = np.ones(H, np.float32)
    s["bert.embeddings.LayerNorm.bias"] = np.zeros(H, np.float32)
    for i in range(TEXT_CFG["num_hidden_layers"]):
        b = "bert.encoder.layer.%d." % i
        for n in ("query", "key", "value"):
            s[b + "attention.self.%s.weight" % n] = rng.randn(
                H, H).astype(np.float32)
            s[b + "attention.self.%s.bias" % n] = np.zeros(H, np.float32)
        s[b + "attention.output.dense.weight"] = rng.randn(
            H, H).astype(np.float32)
        s[b + "attention.output.dense.bias"] = np.zeros(H, np.float32)
        s[b + "attention.output.LayerNorm.weight"] = np.ones(H, np.float32)
        s[b + "attention.output.LayerNorm.bias"] = np.zeros(H, np.float32)
        s[b + "intermediate.dense.weight"] = rng.randn(
            TEXT_CFG["intermediate_size"], H).astype(np.float32)
        s[b + "intermediate.dense.bias"] = np.zeros(
            TEXT_CFG["intermediate_size"], np.float32)
        s[b + "output.dense.weight"] = rng.randn(
            H, TEXT_CFG["intermediate_size"]).astype(np.float32)
        s[b + "output.dense.bias"] = np.zeros(H, np.float32)
        s[b + "output.LayerNorm.weight"] = np.ones(H, np.float32)
        s[b + "output.LayerNorm.bias"] = np.zeros(H, np.float32)
    s["text_projection"] = rng.randn(H, 16).astype(np.float32)

    converted = WukongCLIP.convert_pytorch_state_dict(s, cfg)

    def shapes(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(shapes(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.asarray(v).shape
        return out

    ref_shapes = shapes(jax.tree.map(np.asarray, ref))
    for path, shp in shapes(converted).items():
        assert path in ref_shapes, path
        assert ref_shapes[path] == shp, (path, shp, ref_shapes[path])


def test_clip_dataset_image_cache_parity(tmp_path):
    """image_cache=ram must return bit-identical pixel_values on every pass
    (the cache stores the post-resize uint8; normalisation is re-applied)."""
    make_args()
    model_dir = make_pretrained(str(tmp_path / "tiny-bert-cache"))
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    tok = BertTokenizer.from_pretrained(model_dir)
    path = str(tmp_path / "clip_cache.tsv")
    with open(path, "w") as f:
        for i in range(3):
            f.write("caption %d\t%s\n" % (i, _b64_png(i)))
    from easynlp_tpu.appzoo.clip.data import CLIPDataset
    kw = dict(max_seq_length=16, input_schema="text:str:1,image:str:1",
              first_sequence="text", second_sequence="image", image_size=32)
    plain = CLIPDataset(path, tok, **kw)
    cached = CLIPDataset(path, tok, image_cache="ram", **kw)
    for i in range(3):
        ref = plain[i]["pixel_values"]
        np.testing.assert_array_equal(cached[i]["pixel_values"], ref)  # cold
        np.testing.assert_array_equal(cached[i]["pixel_values"], ref)  # hot
    assert len(cached._img_cache) == 3
    bounded = CLIPDataset(path, tok, image_cache="ram",
                          image_cache_items=1, **kw)
    for i in range(3):
        np.testing.assert_array_equal(bounded[i]["pixel_values"],
                                      plain[i]["pixel_values"])
    assert len(bounded._img_cache) == 1


def test_uint8_pixels_normalized_in_graph(tmp_path):
    """CLIPDataset ships raw uint8 pixels; ViTEncoder normalises integer
    input in-graph with the CLIP constants — the result must match the host
    float path (data/image_utils.normalize_clip_u8) exactly, so the 4x
    host->device transfer saving costs no accuracy."""
    make_args()
    model_dir = make_pretrained(str(tmp_path / "tiny-bert"))
    from easynlp_tpu.appzoo.clip.data import CLIPDataset
    from easynlp_tpu.appzoo.clip.model import CLIPApp
    from easynlp_tpu.data.image_utils import normalize_clip_u8
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    from easynlp_tpu.modelzoo.models.clip import CLIPConfig, CLIPModel

    tok = BertTokenizer.from_pretrained(model_dir)
    path = str(tmp_path / "clip.tsv")
    with open(path, "w") as f:
        for i in range(4):
            f.write("a fine day %d\t%s\n" % (i, _b64_png(i)))
    ds = CLIPDataset(path, tok, max_seq_length=16,
                     input_schema="text:str:1,image:str:1",
                     first_sequence="text", second_sequence="image",
                     image_size=32)
    batch = ds.batch_fn([ds[i] for i in range(4)])
    assert batch["pixel_values"].dtype == np.uint8

    cfg = CLIPConfig(
        text_config=dict(TEXT_CFG, vocab_size=tok.vocab_size),
        vision_config=VISION_CFG, projection_dim=16)
    module = CLIPModel.from_config(cfg, dtype=jnp.float32)
    params = CLIPApp.init_params(module, cfg)
    app = CLIPApp(module, params, cfg)

    out_u8 = app.forward(dict(batch))
    host = dict(batch)
    host["pixel_values"] = normalize_clip_u8(
        batch["pixel_values"]).astype(np.float32)
    out_f32 = app.forward(host)
    np.testing.assert_allclose(np.asarray(out_u8["image_embeds"]),
                               np.asarray(out_f32["image_embeds"]),
                               rtol=0, atol=1e-6)


def test_clip_normalization_constants_single_source_of_truth():
    """modeling_clip's in-graph constants must equal image_utils' host
    constants (duplicated so modelzoo stays free of data-layer imports;
    this pins them together — advisor round-3 finding)."""
    from easynlp_tpu.data.image_utils import CLIP_MEAN, CLIP_STD
    from easynlp_tpu.modelzoo.models.clip.modeling_clip import (
        CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
    # compare at float32 (the dtype both paths compute in; the literals
    # differ only past float32 precision)
    np.testing.assert_array_equal(
        np.asarray(CLIP_IMAGE_MEAN, np.float32), np.asarray(CLIP_MEAN))
    np.testing.assert_array_equal(
        np.asarray(CLIP_IMAGE_STD, np.float32), np.asarray(CLIP_STD))


def test_predictor_host_path_honors_config_mean_std(tmp_path):
    """preprocess_base64_batch must thread per-checkpoint image_mean/std
    overrides (advisor round-3 finding: host float path previously used
    the hardcoded CLIP constants unconditionally)."""
    import base64
    import io

    from PIL import Image

    from easynlp_tpu.data.image_utils import preprocess_base64_batch

    img = Image.fromarray(
        (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    default = preprocess_base64_batch([b64], image_size=8)
    custom = preprocess_base64_batch([b64], image_size=8,
                                     mean=[0.5, 0.5, 0.5],
                                     std=[0.5, 0.5, 0.5])
    assert not np.allclose(default, custom)
    u8 = np.asarray(img)
    want = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(custom[0], want, atol=1e-6)
