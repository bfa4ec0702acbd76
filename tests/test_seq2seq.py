import jax
import jax.numpy as jnp
import numpy as np
import pytest

T5_TINY = dict(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_heads=4, dropout_rate=0.0)
BART_TINY = dict(vocab_size=120, d_model=32, encoder_layers=2,
                 decoder_layers=2, encoder_attention_heads=4,
                 decoder_attention_heads=4, encoder_ffn_dim=64,
                 decoder_ffn_dim=64, max_position_embeddings=64, dropout=0.0,
                 attention_dropout=0.0, activation_dropout=0.0)


def test_t5_parity_vs_torch():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.T5Config(**T5_TINY, decoder_start_token_id=0)
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.t5 import T5Config, T5ForConditionalGeneration
    from easynlp_tpu.modelzoo.models.t5.conversion import convert_t5_state_dict
    cfg = T5Config(**T5_TINY)
    m = T5ForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    params = convert_t5_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(0).randint(2, 120, (2, 9))
    dec = np.random.RandomState(1).randint(2, 120, (2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  decoder_input_ids=jnp.asarray(dec), deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=3e-4)

    # greedy generation matches HF
    from easynlp_tpu.modelzoo.seq2seq_generation import encoder_decoder_generate
    mask = np.ones((2, 9), np.int32)
    ours = np.asarray(encoder_decoder_generate(
        m, params, jnp.asarray(ids), jnp.asarray(mask), max_length=12))
    hf_out = hf.generate(torch.tensor(ids), max_length=12,
                         do_sample=False).numpy()
    for i in range(2):
        n = min(len(hf_out[i]), ours.shape[1])
        np.testing.assert_array_equal(ours[i][:n], hf_out[i][:n])


def test_bart_parity_vs_torch():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BartConfig(**BART_TINY)
    torch.manual_seed(0)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.bart import (BartConfig,
                                                  BartForConditionalGeneration)
    from easynlp_tpu.modelzoo.models.bart.conversion import (
        convert_bart_state_dict)
    cfg = BartConfig(**BART_TINY)
    m = BartForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    params = convert_bart_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(0).randint(3, 120, (2, 9))
    dec = np.random.RandomState(1).randint(3, 120, (2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  decoder_input_ids=jnp.asarray(dec), deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=3e-4)


def test_seq_gen_dataset(tmp_path):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
    from make_fixtures import make_pretrained
    from easynlp_tpu.modelzoo.models.bert import BertTokenizer
    from easynlp_tpu.testing import make_args
    make_args()
    model_dir = make_pretrained(str(tmp_path / "tiny"))
    tok = BertTokenizer.from_pretrained(model_dir)
    path = str(tmp_path / "gen.tsv")
    with open(path, "w") as f:
        f.write("a good day\tgood\n")
        f.write("bad story time\tbad\n")
    from easynlp_tpu.appzoo.sequence_generation.data import (
        SequenceGenerationDataset)
    ds = SequenceGenerationDataset(path, tok, max_seq_length=12,
                                   max_target_length=6,
                                   input_schema="src:str:1,tgt:str:1",
                                   first_sequence="src", second_sequence="tgt",
                                   decoder_start_token_id=0)
    ex = ds[0]
    assert ex["decoder_input_ids"][0] == 0
    lab = ex["labels"]
    valid = lab != -100
    assert valid.sum() >= 2  # token + eos
    # shifted teacher forcing
    assert ex["decoder_input_ids"][1] == lab[0]


def test_t5_train_step(tmp_path):
    """T5 teacher-forced training step runs through the Trainer."""
    from easynlp_tpu.appzoo.sequence_generation.model import SequenceGeneration
    from easynlp_tpu.modelzoo.models.t5 import T5Config
    from easynlp_tpu.testing import make_args
    import optax
    from easynlp_tpu.core.optimizers import get_optimizer

    make_args()
    cfg = T5Config(**T5_TINY)
    module = SequenceGeneration.build_module(cfg, dtype=jnp.float32)
    params = SequenceGeneration.init_params(module, cfg)
    batch = {
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "decoder_input_ids": jnp.ones((2, 4), jnp.int32),
        "decoder_attention_mask": jnp.ones((2, 4), jnp.int32),
        "labels": jnp.ones((2, 4), jnp.int32),
    }

    def loss(p):
        out = module.apply({"params": p}, input_ids=batch["input_ids"],
                           attention_mask=batch["attention_mask"],
                           decoder_input_ids=batch["decoder_input_ids"],
                           decoder_attention_mask=batch["decoder_attention_mask"],
                           deterministic=True)
        return SequenceGeneration.loss_fn(out, batch)["loss"]

    g = jax.grad(loss)(params)
    gnorm = optax.global_norm(g)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_bart_generation_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BartConfig(**BART_TINY, forced_bos_token_id=None,
                                     forced_eos_token_id=None)
    torch.manual_seed(0)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.bart import (BartConfig,
                                                  BartForConditionalGeneration)
    from easynlp_tpu.modelzoo.models.bart.conversion import (
        convert_bart_state_dict)
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        encoder_decoder_generate)
    cfg = BartConfig(**BART_TINY)
    m = BartForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    params = convert_bart_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(3).randint(3, 120, (2, 7))
    mask = np.ones((2, 7), np.int32)
    ours = np.asarray(encoder_decoder_generate(
        m, params, jnp.asarray(ids), jnp.asarray(mask), max_length=12))
    hf_out = hf.generate(torch.tensor(ids), max_length=12,
                         do_sample=False, decoder_start_token_id=2,
                         forced_bos_token_id=None).numpy()
    for i in range(2):
        n = min(len(hf_out[i]), ours.shape[1])
        np.testing.assert_array_equal(ours[i][:n], hf_out[i][:n])


def test_bart_beam_cache_reindex_collision_shape():
    """Beam search at B=2, K=4, S_enc=8 — S_enc == B*K, the exact shape where
    shape-sniffed cache reindexing gathered the encoder states along the
    sequence axis and silently corrupted generations (ADVICE round 1). Must be
    token-exact vs HF beam search."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BartConfig(**BART_TINY, forced_bos_token_id=None,
                                     forced_eos_token_id=None)
    torch.manual_seed(0)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.bart import (BartConfig,
                                                  BartForConditionalGeneration)
    from easynlp_tpu.modelzoo.models.bart.conversion import (
        convert_bart_state_dict)
    from easynlp_tpu.modelzoo.seq2seq_generation import (
        encoder_decoder_generate)
    cfg = BartConfig(**BART_TINY)
    m = BartForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    params = convert_bart_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(5).randint(3, 120, (2, 8))
    mask = np.ones((2, 8), np.int32)
    ours = np.asarray(encoder_decoder_generate(
        m, params, jnp.asarray(ids), jnp.asarray(mask), max_length=12,
        num_beams=4, length_penalty=1.0))
    hf_out = hf.generate(torch.tensor(ids), max_length=12, num_beams=4,
                         do_sample=False, decoder_start_token_id=2,
                         length_penalty=1.0, early_stopping=True,
                         forced_bos_token_id=None).numpy()
    for i in range(2):
        n = min(len(hf_out[i]), ours.shape[1])
        np.testing.assert_array_equal(ours[i][:n], hf_out[i][:n])
