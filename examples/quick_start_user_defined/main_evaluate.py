"""User-defined evaluate main (reference
examples/quick_start_user_defined/main_evaluate.py): load a trained
checkpoint and run the evaluator directly."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import easynlp_tpu
    from easynlp_tpu.appzoo.api import _tokenizer_for
    from easynlp_tpu.appzoo.sequence_classification.data import (
        ClassificationDataset)
    from easynlp_tpu.appzoo.sequence_classification.evaluator import (
        SequenceClassificationEvaluator)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    from easynlp_tpu.utils.global_vars import get_args

    easynlp_tpu.initialize_easynlp()
    args = get_args()
    ckpt = args.checkpoint_dir

    tokenizer = _tokenizer_for(ckpt)
    valid_dataset = ClassificationDataset(
        args.tables.split(",")[0], tokenizer=tokenizer,
        max_seq_length=args.sequence_length, input_schema=args.input_schema,
        first_sequence=args.first_sequence,
        second_sequence=args.second_sequence, label_name=args.label_name,
        label_enumerate_values=args.label_enumerate_values)
    app = SequenceClassification.from_pretrained(
        ckpt, args=args,
        num_labels=max(len(valid_dataset.label_enumerate_values), 2))
    evaluator = SequenceClassificationEvaluator(valid_dataset, args=args)
    for metric, score in evaluator.evaluate(app):
        print("eval %s: %.6f" % (metric, score))


if __name__ == "__main__":
    main()
