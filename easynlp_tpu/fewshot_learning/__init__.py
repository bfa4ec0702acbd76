from easynlp_tpu.fewshot_learning.fewshot_application import (  # noqa: F401
    CPTClassification,
    FewshotClassification,
)
from easynlp_tpu.fewshot_learning.fewshot_dataset import (  # noqa: F401
    FewshotDataset,
)
