"""EasyNLP-TPU: a TPU-native (JAX/XLA/Pallas/pjit) NLP & multi-modal toolkit.

Re-designed from scratch with the capabilities of alibaba/EasyNLP (see SURVEY.md):
an `easynlp` CLI + AppZoo (classification, match, labeling, MLM, generation, MRC,
IE, few-shot, distillation, CLIP, diffusion, ...), a shared Trainer/Evaluator/
Predictor core, a ModelZoo with Auto* registries, and a pipeline() API — with the
PyTorch DDP / Megatron-mpu / DeepSpeed substrate replaced by a single pjit-sharded
train step over a `jax.sharding.Mesh` (dp/fsdp/tp), Pallas kernels for attention
and fused losses, and bf16-first compute.
"""

__version__ = "0.1.0"

from easynlp_tpu.utils.initializer import initialize_easynlp  # noqa: F401
from easynlp_tpu.utils.global_vars import get_args  # noqa: F401
