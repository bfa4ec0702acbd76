"""Randeng (IDEA Fengshenbang) seq2seq model.

Capability parity: reference easynlp/modelzoo/models/randeng/
modeling_randeng.py (2,736 LoC) — which is, verbatim, the Pegasus
architecture under RandengConfig (its classes are named Pegasus* and carry
HF "Copied from ...marian/pegasus" headers). Pre-LN blocks, Pegasus-layout
sinusoidal positions, sqrt(d) embedding scale, final LayerNorm; the same
shared stack configuration as our Pegasus family.
"""

from easynlp_tpu.modelzoo.models.bart.configuration_bart import (  # noqa: F401
    RandengConfig,
)
from easynlp_tpu.modelzoo.models.pegasus.modeling_pegasus import (
    PegasusForConditionalGeneration,
    convert_pegasus_state_dict,
)

convert_randeng_state_dict = convert_pegasus_state_dict


class RandengForConditionalGeneration(PegasusForConditionalGeneration):
    config_class = RandengConfig
