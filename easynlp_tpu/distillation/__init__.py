from easynlp_tpu.distillation.distill_application import (  # noqa: F401
    DistillatorySequenceClassification,
)
from easynlp_tpu.distillation.distill_dataset import (  # noqa: F401
    DistillatoryClassificationDataset,
)
