"""HF-adapter seam: a stock transformers Flax model trains under our
Trainer (reference examples/hf_adapter_easynlp)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


def _tiny_hf_model(num_labels=2, vocab=128):
    from transformers import BertConfig, FlaxBertForSequenceClassification
    cfg = BertConfig(vocab_size=vocab, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64, num_labels=num_labels)
    return FlaxBertForSequenceClassification(cfg, seed=0)


def test_hf_flax_model_trains_under_trainer(tmp_path):
    import jax

    from easynlp_tpu.appzoo.hf_adapter import HFAdapterClassification
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import make_args

    app = HFAdapterClassification.from_hf(_tiny_hf_model(),
                                          label_mapping={"0": 0, "1": 1})

    class Synthetic:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            label = i % 2
            ids = rng.randint(5 + 50 * label, 60 + 50 * label, 16)
            return {"input_ids": ids.astype(np.int32),
                    "attention_mask": np.ones(16, np.int32),
                    "token_type_ids": np.zeros(16, np.int32),
                    "label_ids": np.int32(label)}

        def batch_fn(self, ex):
            return {k: np.stack([e[k] for e in ex]) for k in ex[0]}

    args = make_args(micro_batch_size=8, epoch_num=3.0, logging_steps=100,
                     checkpoint_dir=str(tmp_path / "ckpt"),
                     learning_rate=5e-4)
    trainer = Trainer(app, Synthetic(), evaluator=None, args=args)
    ds = Synthetic()
    batch = ds.batch_fn([ds[i] for i in range(8)])
    first = None
    p, o = trainer.params, trainer.opt_state
    db = jax.device_put(batch, trainer.batch_shard)
    for step in range(8):
        p, o, metrics = trainer._train_step(p, o, db, step)
        loss = float(metrics["loss"])
        first = first if first is not None else loss
    assert np.isfinite(loss)
    assert loss < first, (first, loss)

    # inference path returns predictions/probabilities
    out = app.forward(batch, params=jax.device_get(p))
    assert np.asarray(out["predictions"]).shape == (8,)
