"""Decompose the BERT-base bench step on the TPU (scratch; not committed)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from easynlp_tpu.core.trainer import Trainer
from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                 bert_base_config, make_args)
from easynlp_tpu.appzoo.sequence_classification.model import (
    SequenceClassification, SequenceClassificationModule)

SEQ, BATCH = 128, 128

args = make_args(micro_batch_size=BATCH, sequence_length=SEQ, dtype="bfloat16",
                 epoch_num=100.0, logging_steps=10**9, checkpoint_dir=None)
config = bert_base_config(seq_len=512)
module = SequenceClassificationModule(config=config, dtype=jnp.bfloat16, num_labels=2)
params = SequenceClassification.init_params(module, config)
app = SequenceClassification(module, params, config)
ds = SyntheticClassificationDataset(n=BATCH * 4, seq_len=SEQ, vocab_size=config.vocab_size)
tr = Trainer(app, ds, evaluator=None, args=args)
batch = next(iter(tr.train_loader)); batch.pop("_valid", None)
db = jax.device_put(batch, tr.batch_shard)

# --- full train step (threads donated state like bench.py) -------------------
p, o = tr.params, tr.opt_state
for s in range(3):
    p, o, m = tr._train_step(p, o, db, s)
float(m["loss"])
t0 = time.perf_counter()
N = 20
for s in range(3, 3 + N):
    p, o, m = tr._train_step(p, o, db, s)
float(m["loss"])
ms = (time.perf_counter() - t0) / N * 1000
print("full train step      : %7.2f ms  (%.1f samples/s)" % (ms, BATCH / ms * 1000))

mk = app.model_input_keys
rng = jax.random.key(0, impl="rbg")
ins = {k: db[k] for k in mk if k in db}

def bench_fn(fn, *a, n=20, warm=3):
    for _ in range(warm):
        out = fn(*a)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000

fwd = jax.jit(lambda p, b: module.apply({"params": p}, **b,
                                        deterministic=False, rngs={"dropout": rng}))
print("forward (dropout)    : %7.2f ms" % bench_fn(fwd, p, ins))

fwd_d = jax.jit(lambda p, b: module.apply({"params": p}, **b, deterministic=True))
print("forward (determ.)    : %7.2f ms" % bench_fn(fwd_d, p, ins))

loss_fn = app.loss_fn
def fl(params, b, full):
    out = module.apply({"params": params}, **{k: b[k] for k in mk if k in b},
                       deterministic=False, rngs={"dropout": rng})
    return loss_fn(out, b)["loss"].astype(jnp.float32)
g = jax.jit(lambda p, b: jax.grad(fl)(p, b, None))
print("fwd+bwd (grad)       : %7.2f ms" % bench_fn(g, p, db))

gr = g(p, db)
upd = jax.jit(lambda gr, o, p: tr.tx.update(gr, o, p))
print("optimizer update     : %7.2f ms" % bench_fn(upd, gr, o, p))
