"""Generic seq2seq transformer model (the open-domain-dialogue backbone).

Capability parity: reference easynlp/modelzoo/models/transformer/
modeling_transformer.py (1,906 LoC TransformerGeneratorModel) + its own
beam_search.py (584 LoC). The variant-switched architecture (xlm default:
post-LN, learned positions, embedding LayerNorm, sqrt(d) scale, tied output)
is a configuration of the shared encoder-decoder stack; decoding goes
through the shared static-shape generation_utils loop instead of a private
beam searcher — greedy/sample/beam with the same scoring semantics.
"""

from easynlp_tpu.modelzoo.models.bart.conversion import (
    convert_bart_state_dict,
)
from easynlp_tpu.modelzoo.models.bart.modeling_bart import (
    BartForConditionalGeneration,
)
from easynlp_tpu.modelzoo.models.transformer.configuration_transformer import (
    TransformerConfig,
)


class TransformerGeneratorModel(BartForConditionalGeneration):
    config_class = TransformerConfig


def convert_transformer_state_dict(state_dict, config):
    """ParlAI-style checkpoints → our params. ParlAI names map onto the BART
    layout: {encoder,decoder}.layers.N.{attention,ffn}; this handles the
    reference's exported naming which already follows HF conventions."""
    return convert_bart_state_dict(state_dict, config)
