"""Train a stock HuggingFace Flax model with the easynlp_tpu Trainer.

Reference examples/hf_adapter_easynlp wraps raw HF torch models into the
EasyNLP loop with custom HfTrainer/HfEvaluator subclasses; here the
adapter (easynlp_tpu/appzoo/hf_adapter.py) slots the HF Flax module into
the standard pjit Trainer — no subclassing, full feature set (bf16, mesh
sharding, NaN-skip, checkpointing).

    python examples/hf_adapter_easynlp/main.py \
        --user_defined_parameters="hf_model=bert-base-chinese" \
        --tables=train.tsv,dev.tsv \
        --input_schema=label:str:1,sent1:str:1 \
        --first_sequence=sent1 --label_name=label \
        --label_enumerate_values=0,1 --checkpoint_dir=./hf_ckpt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import easynlp_tpu
    from transformers import (AutoTokenizer,
                              FlaxAutoModelForSequenceClassification)

    from easynlp_tpu.appzoo.hf_adapter import HFAdapterClassification
    from easynlp_tpu.appzoo.sequence_classification.data import (
        ClassificationDataset)
    from easynlp_tpu.appzoo.sequence_classification.evaluator import (
        SequenceClassificationEvaluator)
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.utils.global_vars import get_args

    easynlp_tpu.initialize_easynlp()
    args = get_args()
    udp = getattr(args, "user_defined_parameters_dict", {}) or {}
    name = udp.get("hf_model", "bert-base-chinese")

    tokenizer = AutoTokenizer.from_pretrained(name)
    labels = (args.label_enumerate_values or "0,1").split(",")
    hf_model = FlaxAutoModelForSequenceClassification.from_pretrained(
        name, num_labels=len(labels))
    app = HFAdapterClassification.from_hf(
        hf_model, label_mapping={l: i for i, l in enumerate(labels)})

    tables = args.tables.split(",")
    common = dict(tokenizer=tokenizer, max_seq_length=args.sequence_length,
                  input_schema=args.input_schema,
                  first_sequence=args.first_sequence,
                  label_name=args.label_name,
                  label_enumerate_values=args.label_enumerate_values)
    train = ClassificationDataset(tables[0], **common)
    evaluator = None
    if len(tables) > 1:
        evaluator = SequenceClassificationEvaluator(
            ClassificationDataset(tables[1], **common), args=args)
    Trainer(app, train, evaluator=evaluator, args=args,
            tokenizer=None).train()


if __name__ == "__main__":
    main()
