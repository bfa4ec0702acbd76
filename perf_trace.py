"""Capture a profiler trace of the bench train step (scratch)."""
import jax, jax.numpy as jnp

from easynlp_tpu.core.trainer import Trainer
from easynlp_tpu.testing import (SyntheticClassificationDataset,
                                 bert_base_config, make_args)
from easynlp_tpu.appzoo.sequence_classification.model import (
    SequenceClassification, SequenceClassificationModule)

SEQ, BATCH = 128, 128
args = make_args(micro_batch_size=BATCH, sequence_length=SEQ, dtype="bfloat16",
                 epoch_num=100.0, logging_steps=10**9, checkpoint_dir=None, remat="names")
config = bert_base_config(seq_len=512)
module = SequenceClassificationModule(config=config, dtype=jnp.bfloat16, num_labels=2, remat="names")
params = SequenceClassification.init_params(module, config)
app = SequenceClassification(module, params, config)
ds = SyntheticClassificationDataset(n=BATCH * 4, seq_len=SEQ, vocab_size=config.vocab_size)
tr = Trainer(app, ds, evaluator=None, args=args)
batch = next(iter(tr.train_loader)); batch.pop("_valid", None)
db = jax.device_put(batch, tr.batch_shard)
p, o = tr.params, tr.opt_state
for s in range(3):
    p, o, m = tr._train_step(p, o, db, s)
float(m["loss"])
jax.profiler.start_trace("/tmp/trace_bench")
for s in range(3, 9):
    p, o, m = tr._train_step(p, o, db, s)
float(m["loss"])
jax.profiler.stop_trace()
print("trace written")
