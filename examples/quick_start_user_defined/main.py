"""User-defined training main — build the train loop yourself from the
library API instead of going through `--app_name` dispatch.

TPU-native equivalent of the reference
examples/quick_start_user_defined/main.py: construct the dataset, model,
evaluator, and Trainer explicitly, so any piece can be swapped for a
custom class. Run via run_user_defined_local.sh or:

    python main.py --mode=train --tables=train.tsv,dev.tsv \
        --input_schema=label:str:1,sid1:str:1,sent1:str:1,sent2:str:1 \
        --first_sequence=sent1 --second_sequence=sent2 --label_name=label \
        --label_enumerate_values=0,1 --checkpoint_dir=./ckpt \
        --user_defined_parameters='pretrain_model_name_or_path=<dir-or-zoo-name>'
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

print("*" * 50)
print("running local main...\n")


def main():
    import easynlp_tpu
    from easynlp_tpu.appzoo.sequence_classification.data import (
        ClassificationDataset)
    from easynlp_tpu.appzoo.sequence_classification.evaluator import (
        SequenceClassificationEvaluator)
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    from easynlp_tpu.appzoo.api import _tokenizer_for
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.utils.global_vars import get_args

    easynlp_tpu.initialize_easynlp()
    args = get_args()
    # initialize_easynlp already resolved pretrain_model_name_or_path
    # (zoo name → local dir) into args.pretrained_model_name_or_path
    pretrained = args.pretrained_model_name_or_path
    print("pretrained_model_name_or_path", pretrained)

    tokenizer = _tokenizer_for(pretrained)
    tables = args.tables.split(",")
    common = dict(tokenizer=tokenizer, max_seq_length=args.sequence_length,
                  input_schema=args.input_schema,
                  first_sequence=args.first_sequence,
                  second_sequence=args.second_sequence,
                  label_name=args.label_name,
                  label_enumerate_values=args.label_enumerate_values)
    train_dataset = ClassificationDataset(tables[0], **common)
    valid_dataset = ClassificationDataset(tables[-1], **common)

    app = SequenceClassification.from_pretrained(
        pretrained, args=args,
        num_labels=max(len(train_dataset.label_enumerate_values), 2),
        label_mapping=train_dataset.label_mapping)
    evaluator = SequenceClassificationEvaluator(valid_dataset, args=args)

    trainer = Trainer(app, train_dataset, evaluator=evaluator, args=args,
                      tokenizer=tokenizer)
    trainer.train()


if __name__ == "__main__":
    main()
