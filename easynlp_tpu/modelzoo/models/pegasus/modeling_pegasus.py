"""Pegasus seq2seq model.

Capability parity: reference easynlp/modelzoo/models/pegasus/
modeling_pegasus.py (2,329 LoC of copied-then-switched BART code). The
architectural deltas vs BART are exactly a configuration of the shared
encoder-decoder stack (the reference's own code is a Marian/BART copy with
these switches, see its "# Copied from" headers):

- pre-LN residual blocks (normalize_before=True)
- static sinusoidal position embeddings, Pegasus/Marian half-sin/half-cos
  layout, no learned table, no +2 offset
- sqrt(d_model) embedding scaling
- no embedding LayerNorm; final LayerNorm after the last block

Weight import reuses convert_bart_state_dict (HF Pegasus uses BART's
parameter naming); the sinusoidal table is recomputed, not loaded. HF logit
parity is locked by tests/test_pegasus.py.
"""

from easynlp_tpu.modelzoo.models.bart.configuration_bart import (  # noqa: F401
    PegasusConfig,
)
from easynlp_tpu.modelzoo.models.bart.conversion import (
    convert_bart_state_dict,
)
from easynlp_tpu.modelzoo.models.bart.modeling_bart import (
    BartForConditionalGeneration,
)


class PegasusForConditionalGeneration(BartForConditionalGeneration):
    """The Pegasus module graph = the shared stack under PegasusConfig's
    switch set; guard them here so a config edit can't silently produce a
    BART hybrid that still loads Pegasus checkpoints."""

    config_class = PegasusConfig

    @classmethod
    def from_config(cls, config, **kwargs):
        assert config.normalize_before, "Pegasus is pre-LN"
        assert config.position_type == "sinusoidal", \
            "Pegasus uses static sinusoidal positions"
        assert config.final_layer_norm, "Pegasus ends with a final LayerNorm"
        return super().from_config(config, **kwargs)


def convert_pegasus_state_dict(state_dict, config):
    """HF Pegasus → our params (BART naming; sinusoidal buffers skipped)."""
    state_dict = {k: v for k, v in state_dict.items()
                  if not k.endswith("embed_positions.weight")}
    return convert_bart_state_dict(state_dict, config)
