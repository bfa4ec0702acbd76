"""User-defined predict main (reference
examples/quick_start_user_defined/main_predict.py): wire the predictor and
PredictorManager yourself."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import easynlp_tpu
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    from easynlp_tpu.appzoo.sequence_classification.predictor import (
        SequenceClassificationPredictor)
    from easynlp_tpu.core.predictor import PredictorManager
    from easynlp_tpu.utils.global_vars import get_args

    easynlp_tpu.initialize_easynlp()
    args = get_args()
    ckpt = args.checkpoint_dir

    app = SequenceClassification.from_pretrained(ckpt, args=args)
    predictor = SequenceClassificationPredictor(
        model_dir=ckpt, app=app,
        first_sequence=args.first_sequence,
        second_sequence=args.second_sequence,
        sequence_length=args.sequence_length,
        batch_size=args.micro_batch_size)
    PredictorManager(
        predictor=predictor,
        input_file=args.tables.split(",")[0],
        input_schema=args.input_schema,
        output_file=args.outputs,
        output_schema=args.output_schema,
        append_cols=args.append_cols,
        args=args).run()


if __name__ == "__main__":
    main()
