"""Local-registry resolution: modelzoo name->tgz, appzoo default models for
pipeline(), and the datahub loading-script registry — the zero-egress
equivalents of the reference's remote fetch seams (reference
utils/__init__.py:101-202, pipelines/__init__.py:161-249,
appzoo/dataset.py:393-438)."""

import json
import os
import tarfile

import pytest


@pytest.fixture
def registry(tmp_path, monkeypatch):
    """A plain-directory registry root + isolated cache root."""
    root = tmp_path / "registry"
    cache = tmp_path / "cache"
    root.mkdir()
    cache.mkdir()
    monkeypatch.setenv("EASYNLP_REMOTE_MODELZOO", str(root))
    monkeypatch.setenv("EASYNLP_CACHE_ROOT", str(cache))
    return root


def _tiny_model_dir(base, name="tiny-bert"):
    d = base / name
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps(
        {"model_type": "bert", "vocab_size": 32, "hidden_size": 16,
         "num_hidden_layers": 1, "num_attention_heads": 2,
         "intermediate_size": 32, "max_position_embeddings": 32}))
    (d / "vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list("abcdef")))
    return d


def _tar_into(src_dir, registry_root, rel_tgz):
    tgz = registry_root / rel_tgz
    tgz.parent.mkdir(parents=True, exist_ok=True)
    with tarfile.open(tgz, "w:gz") as tar:
        tar.add(src_dir, arcname=os.path.basename(str(src_dir)))


def test_modelzoo_name_resolution(registry, tmp_path):
    """get_pretrain_model_path('name') resolves through
    modelzoo_alibaba.json -> tgz fetch -> untarred local dir."""
    from easynlp_tpu.utils import get_pretrain_model_path

    src = _tiny_model_dir(tmp_path / "src")
    _tar_into(src, registry, "public/tiny-bert.tgz")
    (registry / "modelzoo_alibaba.json").write_text(json.dumps(
        {"my-tiny-bert": "public/tiny-bert.tgz"}))

    local = get_pretrain_model_path("my-tiny-bert")
    assert os.path.isfile(os.path.join(local, "config.json"))
    assert os.path.isfile(os.path.join(local, "vocab.txt"))
    # second resolution hits the cache even with the registry gone
    (registry / "modelzoo_alibaba.json").unlink()
    assert get_pretrain_model_path("my-tiny-bert") == local

    from easynlp_tpu.utils.zoo_registry import list_pretrained_models
    assert list_pretrained_models() == ["my-tiny-bert"]


def test_unknown_name_still_warns_not_raises(registry):
    from easynlp_tpu.utils import get_pretrain_model_path
    (registry / "modelzoo_alibaba.json").write_text("{}")
    assert get_pretrain_model_path("no-such-model") == "no-such-model"


def _train_tiny_checkpoint(base):
    """A real trained text_classify checkpoint (the registry artifact)."""
    from easynlp_tpu import cli
    from easynlp_tpu.utils import global_vars

    base.mkdir(parents=True, exist_ok=True)
    train = base / "train.tsv"
    rows = ["%d\t%s\t%s" % (i, "a b c" if i % 2 else "d e f",
                            "pos" if i % 2 else "neg") for i in range(16)]
    train.write_text("\n".join(rows) + "\n")
    model = _tiny_model_dir(base, "pretrain")
    ck = base / "ckpt"
    global_vars._GLOBAL_ARGS = None
    rc = cli.main([
        "--mode=train", "--app_name=text_classify",
        "--tables=%s,%s" % (train, train),
        "--input_schema=id:str:1,sent:str:1,label:str:1",
        "--first_sequence=sent", "--label_name=label",
        "--checkpoint_dir=" + str(ck), "--epoch_num=1",
        "--micro_batch_size=8", "--sequence_length=8", "--dtype=float32",
        "--pretrained_model_name_or_path=" + str(model)])
    assert rc == 0
    return ck


def test_pipeline_default_model_from_registry(registry, tmp_path):
    """pipeline('text_classify') with NO model path resolves the task's
    default model through appzoo_config.json (reference
    pipelines/__init__.py:133-135) and serves raw text."""
    ck = _train_tiny_checkpoint(tmp_path / "work")
    _tar_into(ck, registry, "classification/bert-base-sst.tgz")
    (registry / "appzoo_config.json").write_text(json.dumps(
        {"bert-base-sst": {"app_name": "text_classify",
                           "model_path": "classification/bert-base-sst.tgz"}}))

    from easynlp_tpu.pipelines import pipeline
    from easynlp_tpu.utils import global_vars
    global_vars._GLOBAL_ARGS = None
    clf = pipeline("text_classify", first_sequence="sent",
                   sequence_length=8, batch_size=4)
    out = clf("a b c")
    assert out["predictions"] in ("pos", "neg")

    # pipeline('<registered model name>') resolves model AND app
    global_vars._GLOBAL_ARGS = None
    clf2 = pipeline("bert-base-sst", first_sequence="sent",
                    sequence_length=8, batch_size=4)
    assert clf2("d e f")["predictions"] in ("pos", "neg")


def test_every_default_task_resolves_through_registry(registry, tmp_path):
    """Each SUPPORTED_TASK carrying a default model name resolves it through
    the registry mapping (artifact fetch, not Pipeline construction — the
    per-app predictors have their own e2e tests)."""
    from easynlp_tpu.pipelines import SUPPORTED_TASKS
    from easynlp_tpu.utils.zoo_registry import get_app_model_path

    mapping = {}
    for task, spec in SUPPORTED_TASKS.items():
        default = spec.get("default")
        if default is None:
            continue
        art = tmp_path / "arts" / default
        art.mkdir(parents=True, exist_ok=True)
        (art / "MARKER").write_text(task)
        _tar_into(art, registry, "zoo/%s.tgz" % default)
        mapping[default] = {"app_name": task,
                            "model_path": "zoo/%s.tgz" % default}
    assert mapping, "no defaults registered on SUPPORTED_TASKS"
    (registry / "appzoo_config.json").write_text(json.dumps(mapping))

    for default, entry in mapping.items():
        local = get_app_model_path(default)
        marker = os.path.join(local, "MARKER")
        assert os.path.isfile(marker)
        assert open(marker).read() == entry["app_name"]

    from easynlp_tpu.utils.zoo_registry import get_supported_app_model
    by_app = get_supported_app_model()
    assert set(by_app) == {e["app_name"] for e in mapping.values()}


def test_datahub_loading_script_and_listing(registry):
    """load_dataset('name') fetches and runs the registry loading script;
    list_datasets() reads the registry listing (reference
    appzoo/dataset.py:393-438)."""
    script_dir = registry / "datahub" / "toy_sentiment"
    script_dir.mkdir(parents=True)
    (script_dir / "toy_sentiment.py").write_text(
        "import datasets\n"
        "def load(name=None, **kwargs):\n"
        "    return datasets.Dataset.from_dict(\n"
        "        {'text': ['good', 'bad'], 'label': [1, 0]})\n")
    (registry / "datahub" / "datasets_list.txt").write_text(
        "toy_sentiment\n")

    from easynlp_tpu.data.datahub import list_datasets
    from easynlp_tpu.data.dataset import load_dataset
    ds = load_dataset("toy_sentiment")
    assert ds["text"] == ["good", "bad"]
    assert list_datasets() == ["toy_sentiment"]

    # cached after registry removal
    import shutil
    shutil.rmtree(registry / "datahub")
    assert load_dataset("toy_sentiment")["label"] == [1, 0]


def test_datahub_raw_format_delegates(registry, tmp_path):
    f = tmp_path / "rows.csv"
    f.write_text("text,label\nhello,1\nbye,0\n")
    from easynlp_tpu.data.dataset import load_dataset
    ds = load_dataset("csv", data_files=str(f))
    assert ds["train"]["label"] == [1, 0]
