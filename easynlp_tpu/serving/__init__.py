"""HTTP model serving for EasyNLP-TPU.

The reference ships batch inference (core/predictor.py PredictorManager)
and keeps an elastic multi-process serving design as commented-out spec
(reference easynlp/core/predictor.py:232-490); online serving is deferred
to PAI-EAS. This module is the TPU-native online-serving counterpart: a
dependency-free HTTP server over the pipeline() API with dynamic
micro-batching, so concurrent requests are coalesced into one fixed-shape
device batch (one jit program, MXU-friendly) instead of N singleton calls.
"""

from easynlp_tpu.serving.continuous import (ContinuousBatcher,  # noqa: F401
                                            DeviceContinuousDecoder)
from easynlp_tpu.serving.server import (GenerationServer,  # noqa: F401
                                        PredictionServer, serve)
