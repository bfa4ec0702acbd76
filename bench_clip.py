"""Secondary benchmark: CLIP (ViT-B/32 + BERT-base) contrastive training
throughput in pairs/s/chip. Prints one JSON line (the driver's primary
metric stays bench.py)."""

import json
import sys
import time

BATCH = 128
WARMUP = 2
MEASURE = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from easynlp_tpu.appzoo.clip.model import CLIPApp
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.modelzoo.models.clip import CLIPConfig
    from easynlp_tpu.testing import make_args

    args = make_args(micro_batch_size=BATCH, sequence_length=32,
                     dtype="bfloat16", epoch_num=100.0, logging_steps=10**9,
                     checkpoint_dir=None)
    # scan_unroll: full layer unroll in both towers (no while-loop; see
    # modeling_utils.scan_unroll — v5e +13% on the BERT tower)
    cfg = CLIPConfig(
        text_config=dict(vocab_size=21128, hidden_size=768,
                         num_hidden_layers=12, num_attention_heads=12,
                         intermediate_size=3072,
                         max_position_embeddings=512, scan_unroll=12),
        vision_config=dict(image_size=224, patch_size=32, hidden_size=768,
                           num_hidden_layers=12, num_attention_heads=12,
                           intermediate_size=3072, scan_unroll=12),
        projection_dim=512)
    module = CLIPApp.build_module(cfg, dtype=jnp.bfloat16)
    params = CLIPApp.init_params(module, cfg)
    app = CLIPApp(module, params, cfg)

    class SyntheticPairs:
        def __len__(self):
            return BATCH * 2

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {
                "input_ids": rng.randint(0, 21128, 32).astype(np.int32),
                "attention_mask": np.ones(32, np.int32),
                "token_type_ids": np.zeros(32, np.int32),
                "pixel_values": rng.rand(224, 224, 3).astype(np.float32),
            }

        def batch_fn(self, ex):
            return {k: np.stack([e[k] for e in ex]) for k in ex[0]}

    trainer = Trainer(app, SyntheticPairs(), evaluator=None, args=args)
    batch = next(iter(trainer.train_loader))
    batch.pop("_valid", None)
    db = jax.device_put(batch, trainer.batch_shard)
    p, o = trainer.params, trainer.opt_state
    for s in range(WARMUP):
        p, o, m = trainer._train_step(p, o, db, s)
    float(m["loss"])
    t0 = time.perf_counter()
    for s in range(WARMUP, WARMUP + MEASURE):
        p, o, m = trainer._train_step(p, o, db, s)
    float(m["loss"])
    dt = time.perf_counter() - t0
    pairs = MEASURE * BATCH / dt / jax.device_count()
    print(json.dumps({
        "metric": "clip_vitb32_bert_train_pairs_per_sec_per_chip",
        "value": round(pairs, 2), "unit": "pairs/s/chip",
        "vs_baseline": round(pairs / 700.0, 4),  # ~A100 CLIP-B/32 train rate
    }))


if __name__ == "__main__":
    sys.exit(main())
