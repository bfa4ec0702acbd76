"""End-to-end CLI tests for the 5 vision apps (reference parity: each app
trains AND predicts through --mode=train/predict like the reference appzoo —
text2image / image2text / video2text / text2video_retrieval / wukong_clip)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
from make_fixtures import make_vision_pretrained, make_vision_tsvs  # noqa: E402


@pytest.fixture(scope="module")
def vfix(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("vis"))
    make_vision_tsvs(base)
    make_vision_pretrained(base)
    return base


def _run_cli(argv):
    from easynlp_tpu import cli
    from easynlp_tpu.utils import global_vars
    global_vars._GLOBAL_ARGS = None
    return cli.main(argv)


def _train_predict(vfix, app_name, prefix, pretrain, schema_cols, first,
                   second, udp, out_col, seq_len=8, predict_udp=None):
    out_dir = os.path.join(vfix, "ckpt_" + app_name)
    schema = "id:str:1,%s:str:1,%s:str:1" % schema_cols
    rc = _run_cli([
        "--mode=train", "--app_name=" + app_name,
        "--tables=%s/%s_train.tsv,%s/%s_dev.tsv" % (vfix, prefix, vfix,
                                                    prefix),
        "--input_schema=" + schema, "--first_sequence=" + first,
        "--second_sequence=" + second, "--checkpoint_dir=" + out_dir,
        "--epoch_num=1", "--micro_batch_size=8",
        "--sequence_length=%d" % seq_len,
        "--learning_rate=1e-4", "--logging_steps=2", "--dtype=float32",
        "--user_defined_parameters=pretrain_model_name_or_path=%s/%s %s"
        % (vfix, pretrain, udp),
    ])
    assert rc == 0, "train failed for %s" % app_name
    assert os.path.exists(os.path.join(out_dir, "flax_params.msgpack"))

    pred_file = os.path.join(vfix, "pred_%s.tsv" % app_name)
    rc = _run_cli([
        "--mode=predict", "--app_name=" + app_name,
        "--tables=%s/%s_dev.tsv" % (vfix, prefix),
        "--outputs=" + pred_file,
        "--input_schema=" + schema, "--first_sequence=" + first,
        "--second_sequence=" + second,
        "--output_schema=" + out_col, "--append_cols=id",
        "--checkpoint_dir=" + out_dir,
        "--micro_batch_size=8", "--sequence_length=%d" % seq_len,
        "--dtype=float32",
        "--user_defined_parameters=" + (predict_udp or udp),
    ])
    assert rc == 0, "predict failed for %s" % app_name
    with open(pred_file) as f:
        lines = [ln for ln in f.read().strip().split("\n") if ln]
    assert len(lines) == 8
    return lines


def test_text2image_generation_e2e(vfix):
    lines = _train_predict(
        vfix, "text2image_generation", "t2i", "tiny-artist",
        ("text", "imgbase64"), "text", "imgbase64",
        "size=16 text_len=8", "gen_imgbase64")
    # generated cell must be a decodable PNG
    import base64
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(lines[0].split("\t")[0])))
    assert img.size == (16, 16)


def test_image2text_generation_e2e(vfix):
    lines = _train_predict(
        vfix, "image2text_generation", "i2t", "tiny-i2t",
        ("imgbase64", "text"), "imgbase64", "text",
        "img_size=16 text_len=8", "gen_text")
    assert all(len(ln.split("\t")) == 2 for ln in lines)


def test_video2text_generation_e2e(vfix):
    lines = _train_predict(
        vfix, "video2text_generation", "v2t", "tiny-i2t",
        ("frames", "text"), "frames", "text",
        "img_size=16 text_len=8 frame_num=2", "gen_text")
    assert all(len(ln.split("\t")) == 2 for ln in lines)


def test_text2video_retrieval_e2e(vfix):
    lines = _train_predict(
        vfix, "text2video_retrieval", "t2v", "tiny-clip",
        ("text", "video"), "text", "video",
        "max_frames=3 img_size=16", "text_embeds,video_embeds")
    first = lines[0].split("\t")
    assert len(first) == 3
    assert len(first[0].split()) == 8  # projection_dim floats


def test_wukong_clip_e2e(vfix):
    lines = _train_predict(
        vfix, "wukong_clip", "clip", "tiny-clip",
        ("text", "imgbase64"), "text", "imgbase64",
        "image_size=16", "text_embeds,image_embeds")
    first = lines[0].split("\t")
    assert len(first) == 3


def test_image2text_vqgan_variant_e2e(vfix):
    """enable_vqgan i2t variant (mingpt_i2t mirror): trains and predicts
    through the CLI with the ARTIST tower (reference api.py:127-131)."""
    lines = _train_predict(
        vfix, "image2text_generation", "i2t", "tiny-artist",
        ("imgbase64", "text"), "imgbase64", "text",
        "enable_vqgan=True size=16 text_len=8", "gen_text")
    assert all(len(ln.split("\t")) == 2 for ln in lines)
