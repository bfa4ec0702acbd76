"""Aliases — the adapters are backbone-generic (see seq2seq_generation)."""

from easynlp_tpu.modelzoo.seq2seq_generation import (  # noqa: F401
    encoder_decoder_generate,
    make_encoder_decoder_fns,
)

t5_generate = encoder_decoder_generate
make_t5_generation_fns = make_encoder_decoder_fns
