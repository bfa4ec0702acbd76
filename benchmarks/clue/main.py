"""CLUE benchmark harness (train / evaluate / predict one task).

Capability parity: reference benchmarks/clue/{main,main_evaluate,
main_predict}.py — per-task preprocessors + default recipes + the shared
Trainer/Evaluator. TPU-native: one pjit Trainer, bf16, full scan unroll.

Usage (data_dir holds the CLUE task's train.json/dev.json/test.json):

  python benchmarks/clue/main.py --mode=train \
      --user_defined_parameters="task_name=afqmc data_dir=./afqmc \
          pretrain_model_name_or_path=./bert-base-chinese" \
      --checkpoint_dir=./clue_afqmc_ckpt

Per-task defaults (lr / batch / seqlen / epochs) follow the reference
README settings table; any explicitly-passed flag overrides them.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


class ClueDataset:
    """Feature-dict dataset over one CLUE split (shape-static rows)."""

    def __init__(self, feats):
        self.feats = feats
        self.n = feats["input_ids"].shape[0]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {k: v[i] for k, v in self.feats.items()}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


def main():
    import easynlp_tpu
    from benchmarks.clue.preprocess import RECIPES, TASKS
    from easynlp_tpu.appzoo.sequence_classification.evaluator import (
        SequenceClassificationEvaluator)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.modelzoo.models.auto.auto_factory import AutoTokenizer
    from easynlp_tpu.utils import get_pretrain_model_path
    from easynlp_tpu.utils.global_vars import get_args
    from easynlp_tpu.utils.logger import logger

    easynlp_tpu.initialize_easynlp()
    args = get_args()
    udp = getattr(args, "user_defined_parameters_dict", {}) or {}
    task = udp.get("task_name", "afqmc")
    data_dir = udp.get("data_dir", ".")
    if task not in TASKS:
        raise SystemExit("unknown CLUE task %r (have %s)"
                         % (task, sorted(TASKS)))
    # reference-recipe defaults unless explicitly overridden on the CLI
    for k, v in RECIPES[task].items():
        if "--" + k not in " ".join(sys.argv):
            setattr(args, k, v)

    model_dir = get_pretrain_model_path(
        udp.get("pretrain_model_name_or_path",
                args.pretrained_model_name_or_path)
        if args.mode == "train" or not args.checkpoint_dir
        else args.checkpoint_dir)
    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    proc = TASKS[task](tokenizer, max_seq_length=args.sequence_length)
    n_labels = len(proc.get_labels())

    if args.mode == "train":
        app = SequenceClassification.from_pretrained(
            model_dir, args=args, num_labels=n_labels)
        app.label_mapping = proc.label2id
        train = ClueDataset(proc.featurize(proc.read_split(data_dir, "train")))
        dev = ClueDataset(proc.featurize(proc.read_split(data_dir, "dev")))
        evaluator = SequenceClassificationEvaluator(dev, args=args)
        Trainer(app, train, evaluator=evaluator, args=args,
                tokenizer=tokenizer).train()
    elif args.mode == "evaluate":
        app = SequenceClassification.from_pretrained(
            model_dir, args=args, num_labels=n_labels)
        dev = ClueDataset(proc.featurize(proc.read_split(data_dir, "dev")))
        results = SequenceClassificationEvaluator(dev, args=args).evaluate(app)
        for name, score in results:
            logger.info("CLUE %s %s = %.4f", task, name, score)
    elif args.mode == "predict":
        import jax
        app = SequenceClassification.from_pretrained(
            model_dir, args=args, num_labels=n_labels)
        test = ClueDataset(proc.featurize(
            proc.read_split(data_dir, "test"), with_labels=False))
        out_path = args.outputs or "clue_%s_pred.tsv" % task
        bs = args.micro_batch_size
        with open(out_path, "w", encoding="utf-8") as f:
            for start in range(0, len(test), bs):
                rows = [test[i] for i in range(start,
                                               min(start + bs, len(test)))]
                batch = test.batch_fn(rows)
                out = jax.device_get(app.forward(batch))
                for pred in np.asarray(out["predictions"]):
                    f.write("%s\n" % proc.id2label[int(pred)])
        logger.info("predictions written to %s", out_path)
    else:
        raise SystemExit("unknown --mode %r" % args.mode)


if __name__ == "__main__":
    main()
