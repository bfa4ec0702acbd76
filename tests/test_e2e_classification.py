"""End-to-end CLI tests (reference test strategy, SURVEY.md §4: chained
train → evaluate → predict on one checkpoint dir, artifact-existence asserts)
— run in-process on the virtual 8-device CPU mesh with an ultra-tiny model."""

import json
import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
from make_fixtures import build_all  # noqa: E402

BASE = None


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("e2e"))
    build_all(base)
    # shrink the model further for CPU speed
    cfg_path = os.path.join(base, "tiny-bert", "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg.update(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
               intermediate_size=64)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return base


def _run_cli(argv):
    from easynlp_tpu import cli
    from easynlp_tpu.utils import global_vars
    global_vars._GLOBAL_ARGS = None  # fresh args per invocation
    return cli.main(argv)


def test_0_train_then_eval_then_predict(fixtures):
    out_dir = os.path.join(fixtures, "ckpt")
    schema = "id:str:1,sent:str:1,label:str:1"
    rc = _run_cli([
        "--mode=train", "--app_name=text_classify",
        "--tables=%s/train.tsv,%s/dev.tsv" % (fixtures, fixtures),
        "--input_schema=" + schema, "--first_sequence=sent",
        "--label_name=label", "--checkpoint_dir=" + out_dir,
        "--epoch_num=1", "--micro_batch_size=16", "--sequence_length=16",
        "--learning_rate=3e-4", "--logging_steps=8", "--dtype=float32",
        "--user_defined_parameters=pretrain_model_name_or_path=%s/tiny-bert"
        % fixtures,
    ])
    assert rc == 0
    for artifact in ("flax_params.msgpack", "config.json", "vocab.txt",
                     "label_mapping.json", "train_config.json", "meta.json"):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact

    rc = _run_cli([
        "--mode=evaluate", "--app_name=text_classify",
        "--tables=%s/dev.tsv" % fixtures,
        "--input_schema=" + schema, "--first_sequence=sent",
        "--label_name=label", "--checkpoint_dir=" + out_dir,
        "--micro_batch_size=16", "--sequence_length=16", "--dtype=float32",
    ])
    assert rc == 0

    pred_file = os.path.join(fixtures, "pred.tsv")
    rc = _run_cli([
        "--mode=predict", "--app_name=text_classify",
        "--tables=%s/dev.tsv" % fixtures, "--outputs=" + pred_file,
        "--input_schema=" + schema, "--first_sequence=sent",
        "--output_schema=predictions,probabilities", "--append_cols=label",
        "--checkpoint_dir=" + out_dir,
        "--micro_batch_size=16", "--sequence_length=16", "--dtype=float32",
    ])
    assert rc == 0
    with open(pred_file) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 64
    first = lines[0].split("\t")
    assert first[0] in ("pos", "neg")
    assert len(first) == 3


def test_1_pipeline_from_checkpoint(fixtures):
    """pipeline() infers the task from train_config.json and serves raw text
    (reference pipelines/__init__.py)."""
    out_dir = os.path.join(fixtures, "ckpt")
    if not os.path.exists(os.path.join(out_dir, "train_config.json")):
        pytest.skip("train test must run first")
    from easynlp_tpu.pipelines import pipeline
    clf = pipeline(out_dir, first_sequence="sent", sequence_length=16,
                   batch_size=8)
    single = clf("a good happy day")
    assert single["predictions"] in ("pos", "neg")
    batch = clf(["a good happy day", "an awful sad story"])
    assert len(batch) == 2
    assert all(r["predictions"] in ("pos", "neg") for r in batch)

    # pair inputs without an explicit second_sequence must be CONSUMED (the
    # fallback key is wired into the predictor), not silently dropped: the
    # second text must change the model's input and thus the logits
    base = clf([("a good happy day", "")])[0]
    pair = clf([("a good happy day", "an awful sad story")])[0]
    assert base["logits"] != pair["logits"]  # space-joined float strings


def test_2_general_dataset_hf_adapter():
    """GeneralDataset over an in-memory HF datasets arrow table
    (reference appzoo/dataset.py:302-391)."""
    import datasets as hf_datasets
    from easynlp_tpu.data.dataset import GeneralDataset
    table = hf_datasets.Dataset.from_dict(
        {"text": ["a", "b", "c"], "label": [0, 1, 0]})
    ds = GeneralDataset(table)
    assert len(ds) == 3
    assert ds.parse_row(1) == {"text": "b", "label": 1}


def test_3_nan_step_skip():
    """A poisoned batch must not corrupt params (reference NaN-skip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                     make_args, tiny_bert_config)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)

    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9, checkpoint_dir=None)
    cfg = tiny_bert_config()
    module = SequenceClassificationModule(config=cfg, dtype=jnp.float32,
                                          num_labels=2)
    params = SequenceClassification.init_params(module, cfg)
    app = SequenceClassification(module, params, cfg)

    class PoisonedApp:
        module = app.module
        model_input_keys = app.model_input_keys
        params = app.params
        config = app.config
        label_mapping = {}
        param_logical_axes = app.param_logical_axes

        @staticmethod
        def loss_fn(outputs, batch):
            loss = jnp.float32(jnp.nan) * outputs["logits"].sum()
            return {"loss": loss}

    ds = SyntheticClassificationDataset(n=16, seq_len=8,
                                        vocab_size=cfg.vocab_size)
    tr = Trainer(PoisonedApp(), ds, evaluator=None, args=args)
    batch = next(iter(tr.train_loader))
    batch.pop("_valid", None)
    before = jax.device_get(tr.params)
    p, o, m = tr._train_step(tr.params, tr.opt_state,
                             jax.device_put(batch, tr.batch_shard), 0)
    assert float(m["nonfinite_skip"]) == 1.0
    after = jax.device_get(p)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_4_checkpoint_resume(tmp_path):
    """Resume restores step counter, params, and optimizer state."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                     make_args, tiny_bert_config)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)

    out = str(tmp_path / "ck")
    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                     learning_rate=1e-3)
    cfg = tiny_bert_config()
    module = SequenceClassificationModule(config=cfg, dtype=jnp.float32,
                                          num_labels=2)
    params = SequenceClassification.init_params(module, cfg)
    app = SequenceClassification(module, params, cfg,
                                 label_mapping={"0": 0, "1": 1})
    ds = SyntheticClassificationDataset(n=32, seq_len=8,
                                        vocab_size=cfg.vocab_size)
    tr = Trainer(app, ds, evaluator=None, args=args)
    tr.train()
    assert tr.global_step == tr.t_total
    saved = jax.device_get(tr.params)

    # fresh trainer resuming from the checkpoint
    args2 = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                      epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                      learning_rate=1e-3, resume_from_checkpoint=out)
    app2 = SequenceClassification(
        module, SequenceClassification.init_params(module, cfg), cfg,
        label_mapping={"0": 0, "1": 1})
    tr2 = Trainer(app2, ds, evaluator=None, args=args2)
    assert tr2.global_step == tr.t_total         # step restored
    restored = jax.device_get(tr2.params)
    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # optimizer second moments non-zero after resume (state restored)
    leaves = [x for x in jax.tree.leaves(jax.device_get(tr2.opt_state))
              if hasattr(x, "shape") and getattr(x, "size", 0) > 1]
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in leaves)
    # restored optimizer state keeps the shardings _place_state established
    for new, ref in zip(jax.tree.leaves(tr2.opt_state),
                        jax.tree.leaves(tr.opt_state)):
        if hasattr(ref, "sharding"):
            assert new.sharding.is_equivalent_to(ref.sharding, new.ndim)


def test_5_midepoch_resume(tmp_path):
    """A mid-epoch checkpoint resumes at the right batch: the head of the
    epoch is skipped, only the tail is trained (reference trainer.py:611-614
    fast-forwards by replaying the step counter)."""
    import jax.numpy as jnp
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                     make_args, tiny_bert_config)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)

    out = str(tmp_path / "ck")
    cfg = tiny_bert_config()
    module = SequenceClassificationModule(config=cfg, dtype=jnp.float32,
                                          num_labels=2)

    def make_app():
        return SequenceClassification(
            module, SequenceClassification.init_params(module, cfg), cfg,
            label_mapping={"0": 0, "1": 1})

    ds = SyntheticClassificationDataset(n=32, seq_len=8,
                                        vocab_size=cfg.vocab_size)
    # 4 steps/epoch x 2 epochs; stop and checkpoint mid-epoch at step 6
    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=2.0, logging_steps=10**9, checkpoint_dir=out)
    tr = Trainer(make_app(), ds, evaluator=None, args=args)
    assert tr.steps_per_epoch == 4 and tr.t_total == 8
    it = iter(tr.train_loader)
    tr.train_loader.set_epoch(0)
    import jax as _jax
    for _ in range(6):
        epoch = tr.global_step // tr.steps_per_epoch
        if tr.global_step % tr.steps_per_epoch == 0:
            tr.train_loader.set_epoch(epoch)
            it = iter(tr.train_loader)
        b = next(it)
        b.pop("_valid", None)
        tr.params, tr.opt_state, _ = tr._train_step(
            tr.params, tr.opt_state, _jax.device_put(b, tr.batch_shard),
            tr.global_step)
        tr.global_step += 1
    tr.save_checkpoint()

    args2 = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                      epoch_num=2.0, logging_steps=10**9, checkpoint_dir=out,
                      resume_from_checkpoint=out)
    tr2 = Trainer(make_app(), ds, evaluator=None, args=args2)
    assert tr2.global_step == 6
    assert tr2.start_epoch == 1
    assert tr2._resume_skip_batches == 2   # 2 head batches already trained

    stepped = []
    real_step = tr2._train_step

    def counting_step(params, opt_state, batch, step):
        stepped.append(int(step))
        return real_step(params, opt_state, batch, step)

    tr2._train_step = counting_step
    tr2.train()
    assert stepped == [6, 7]               # only the epoch tail is trained
    assert tr2.global_step == tr2.t_total


def test_4b_ema_state_survives_resume(tmp_path):
    """Resume must restore the EMA shadow + num_updates — not leave the
    shadow at the fresh-init params (advisor round-2 finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                     make_args, tiny_bert_config)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)

    out = str(tmp_path / "ck")
    cfg = tiny_bert_config()
    module = SequenceClassificationModule(config=cfg, dtype=jnp.float32,
                                          num_labels=2)

    def make_app():
        return SequenceClassification(
            module, SequenceClassification.init_params(module, cfg), cfg,
            label_mapping={"0": 0, "1": 1})

    ds = SyntheticClassificationDataset(n=32, seq_len=8,
                                        vocab_size=cfg.vocab_size)
    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                     learning_rate=1e-3, ema_decay=0.999)
    tr = Trainer(make_app(), ds, evaluator=None, args=args)
    tr.train()
    shadow_before = jax.device_get(tr.ema_state["shadow"])
    n_before = int(jax.device_get(tr.ema_state["num_updates"]))
    assert n_before == tr.t_total

    args2 = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                      epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                      learning_rate=1e-3, ema_decay=0.999,
                      resume_from_checkpoint=out)
    tr2 = Trainer(make_app(), ds, evaluator=None, args=args2)
    assert int(jax.device_get(tr2.ema_state["num_updates"])) == n_before
    for a, b in zip(jax.tree.leaves(shadow_before),
                    jax.tree.leaves(jax.device_get(tr2.ema_state["shadow"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_4c_async_save_matches_sync_and_surfaces_errors(tmp_path,
                                                        monkeypatch):
    """--async_save: per-step background writes produce the same artifact
    set as synchronous saves (final checkpoint identical), and a write
    failure surfaces as RuntimeError instead of being lost on the thread."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.modelzoo.modeling_utils import load_params
    from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                     make_args, tiny_bert_config)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)

    cfg = tiny_bert_config()
    module = SequenceClassificationModule(config=cfg, dtype=jnp.float32,
                                          num_labels=2)
    ds = SyntheticClassificationDataset(n=32, seq_len=8,
                                        vocab_size=cfg.vocab_size)

    def run(out, **kw):
        args = make_args(micro_batch_size=8, sequence_length=8,
                         dtype="float32", epoch_num=1.0,
                         logging_steps=10**9, checkpoint_dir=out,
                         learning_rate=1e-3, save_checkpoint_steps=1, **kw)
        app = SequenceClassification(
            module, SequenceClassification.init_params(module, cfg), cfg,
            label_mapping={"0": 0, "1": 1})
        tr = Trainer(app, ds, evaluator=None, args=args)
        tr.train()
        return tr

    sync_dir = str(tmp_path / "sync")
    async_dir = str(tmp_path / "async")
    run(sync_dir)
    tr = run(async_dir, async_save=True)
    assert tr._save_thread is None  # final write joined before train() ends

    import json as _json
    import os as _os
    for d in (sync_dir, async_dir):
        with open(_os.path.join(d, "train_config.json")) as f:
            _json.load(f)
    a = load_params(sync_dir)
    b = load_params(async_dir)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # error path: a failing background write must surface as RuntimeError
    # at the next save / train end instead of dying silently on the thread
    import easynlp_tpu.core.trainer as trainer_mod

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(trainer_mod, "save_params", boom)
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        run(str(tmp_path / "err"), async_save=True)
