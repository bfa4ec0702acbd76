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
