"""HF parity for the round-2 architecture work: Pegasus (pre-LN + sinusoidal
positions + final LN), RoBERTa (padding-offset position ids), and the generic
`transformer` family (ParlAI xlm variant + subword-nmt BPE)."""

import jax.numpy as jnp
import numpy as np
import pytest

PEGASUS_TINY = dict(vocab_size=128, d_model=32, encoder_layers=2,
                    decoder_layers=2, encoder_attention_heads=2,
                    decoder_attention_heads=2, encoder_ffn_dim=64,
                    decoder_ffn_dim=64, max_position_embeddings=64,
                    scale_embedding=True, activation_function="gelu",
                    dropout=0.0, attention_dropout=0.0,
                    activation_dropout=0.0)


def _hf_pegasus():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.PegasusConfig(
        **PEGASUS_TINY, pad_token_id=0, eos_token_id=1,
        decoder_start_token_id=0, forced_eos_token_id=None)
    torch.manual_seed(0)
    return torch, transformers.PegasusForConditionalGeneration(hf_cfg).eval()


def _ours_from(hf):
    from easynlp_tpu.modelzoo.models.pegasus import (
        PegasusConfig, PegasusForConditionalGeneration,
        convert_pegasus_state_dict)
    cfg = PegasusConfig(**PEGASUS_TINY)
    m = PegasusForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    params = convert_pegasus_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    return m, params, cfg


def test_pegasus_parity_vs_torch():
    torch, hf = _hf_pegasus()
    m, params, cfg = _ours_from(hf)
    rng = np.random.RandomState(0)
    src = rng.randint(2, 128, (2, 9))
    tgt = rng.randint(2, 128, (2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(src),
                 decoder_input_ids=torch.tensor(tgt)).logits.numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(src),
                  decoder_input_ids=jnp.asarray(tgt), deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=2e-4)


def test_pegasus_generation_parity():
    torch, hf = _hf_pegasus()
    m, params, cfg = _ours_from(hf)
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        encoder_decoder_generate)
    ids = np.random.RandomState(1).randint(2, 128, (2, 7))
    mask = np.ones((2, 7), np.int32)
    ours = np.asarray(encoder_decoder_generate(
        m, params, jnp.asarray(ids), jnp.asarray(mask), max_length=10))
    hf_out = hf.generate(torch.tensor(ids), max_length=10, do_sample=False,
                         forced_eos_token_id=None).numpy()
    for i in range(2):
        n = min(len(hf_out[i]), ours.shape[1])
        np.testing.assert_array_equal(ours[i][:n], hf_out[i][:n])


def test_randeng_is_pegasus_architecture():
    """Reference randeng/modeling_randeng.py is the Pegasus architecture
    under RandengConfig; ours must build and run the same graph."""
    from easynlp_tpu.modelzoo.models.randeng import (
        RandengConfig, RandengForConditionalGeneration)
    cfg = RandengConfig(**PEGASUS_TINY)
    assert cfg.normalize_before and cfg.position_type == "sinusoidal"
    m = RandengForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    import jax
    params = m.init(jax.random.PRNGKey(0),
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    decoder_input_ids=jnp.ones((1, 3), jnp.int32),
                    deterministic=True)["params"]
    out = m.apply({"params": params}, input_ids=jnp.ones((2, 4), jnp.int32),
                  decoder_input_ids=jnp.ones((2, 3), jnp.int32),
                  deterministic=True)
    assert out["logits"].shape == (2, 3, 128)


def test_roberta_position_ids_parity_vs_torch():
    """Padded batches must reproduce HF RoBERTa exactly — the position ids
    are derived from padding, not arange (the round-1 'unverified
    pos-offset' gap)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    tiny = dict(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=66, type_vocab_size=1,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                pad_token_id=1)
    hf_cfg = transformers.RobertaConfig(**tiny)
    torch.manual_seed(0)
    hf = transformers.RobertaModel(hf_cfg).eval()

    from easynlp_tpu.modelzoo.models.bert import BertModel, RobertaConfig
    from easynlp_tpu.modelzoo.models.bert.conversion import (
        convert_bert_backbone)
    cfg = RobertaConfig(**tiny)
    m = BertModel.from_config(cfg, dtype=jnp.float32)
    state = {k.replace("roberta.", ""): v.numpy()
             for k, v in hf.state_dict().items()}
    params = convert_bert_backbone(state, cfg)

    ids = np.full((2, 10), 1, np.int64)   # pad=1
    rng = np.random.RandomState(0)
    ids[0, :7] = rng.randint(3, 100, 7)
    ids[1, :4] = rng.randint(3, 100, 4)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask))[0].numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids, jnp.int32),
                  attention_mask=jnp.asarray(mask, jnp.int32),
                  deterministic=True)
    ours = np.asarray(out["last_hidden_state"])
    # compare non-pad positions only (HF computes pad rows too, but they are
    # masked out of any downstream use)
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(ours[b, :n], ref[b, :n], atol=3e-4)


def test_transformer_family_tokenizer_and_model(tmp_path):
    import os

    from easynlp_tpu.modelzoo.models.transformer import (
        TransformerConfig, TransformerGeneratorModel, TransformerTokenizer)
    vocab = ["__null__", "__start__", "__end__", "__unk__", "hello",
             "wor@@", "ld", "h", "e", "l", "o", "w", "r", "d", "__newln__"]
    with open(tmp_path / "vocab.txt", "w") as f:
        f.write("\n".join(vocab) + "\n")
    with open(tmp_path / "codecs.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("h e\nhe l\nhel l\nhell o</w>\nw o\nwo r\nl d</w>\n")
    tok = TransformerTokenizer(str(tmp_path / "vocab.txt"),
                               str(tmp_path / "codecs.txt"))
    assert tok.tokenize("hello world") == ["hello", "wor@@", "ld"]
    ids = tok.encode_plus("hello world", max_length=8)["input_ids"]
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids) == "hello world"

    cfg = TransformerConfig(vocab_size=len(vocab), embedding_size=32,
                            ffn_size=64, n_layers=2, n_heads=2,
                            n_positions=32, dropout=0.0)
    assert cfg.d_model == 32 and cfg.encoder_layers == 2
    assert not cfg.normalize_before and cfg.scale_embedding
    m = TransformerGeneratorModel.from_config(cfg, dtype=jnp.float32)
    import jax
    params = m.init(jax.random.PRNGKey(0),
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    decoder_input_ids=jnp.ones((1, 3), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        encoder_decoder_generate)
    seqs = encoder_decoder_generate(
        m, nn.unbox(params), jnp.asarray([[4, 5, 6]], jnp.int32),
        jnp.ones((1, 3), jnp.int32), max_length=8, num_beams=2)
    assert seqs.shape == (1, 8)
