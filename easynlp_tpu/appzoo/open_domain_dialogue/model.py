"""Open-domain dialogue application.

Capability parity: reference easynlp/appzoo/open_domain_dialogue/model.py
:21-69 — seq2seq chat over the generic `transformer` family with per-token CE
ignoring NULL positions, normalised by non-null target tokens; `_generate`
delegates beam decode to the backbone (:71-75). Our generic transformer is
the BART stack (same architecture family as the reference's in-house
transformer), and decoding goes through the shared generation engine.
"""

import jax.numpy as jnp

from easynlp_tpu.appzoo.sequence_generation.model import SequenceGeneration
from easynlp_tpu.utils import losses


class OpenDomainDialogue(SequenceGeneration):
    """Context → response generation; rows are dialogue turns joined by the
    dataset with a separator."""

    @staticmethod
    def loss_fn(outputs, batch):
        # per-token CE ignoring NULL (-100) positions, normalised by the
        # number of non-null target tokens (reference :21-69 semantics —
        # losses.cross_entropy already normalises by valid count)
        return {"loss": losses.cross_entropy(
            outputs["logits"], batch["labels"], ignore_index=-100)}

    def chat(self, history_texts, tokenizer, max_length=64, num_beams=3,
             **kwargs):
        """history (list of utterances) → response string."""
        import numpy as np
        source = " [SEP] ".join(history_texts)
        enc = tokenizer([source], max_length=128)
        seqs = self.generate(jnp.asarray(enc["input_ids"]),
                             jnp.asarray(enc["attention_mask"]),
                             max_length=max_length, num_beams=num_beams,
                             **kwargs)
        return tokenizer.decode(np.asarray(seqs)[0], skip_special_tokens=True)
