import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel, BertForMaskedLM

TINY = dict(vocab_size=200, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)


def test_bert_forward_shapes():
    cfg = BertConfig(**TINY)
    m = BertModel.from_config(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = m.init_params({"params": rng, "dropout": rng}, {"input_ids": ids})
    out = m.apply({"params": params}, input_ids=ids, deterministic=True)
    assert out["last_hidden_state"].shape == (2, 8, 32)
    assert out["pooler_output"].shape == (2, 32)


def test_bert_mlm_tied_embeddings():
    cfg = BertConfig(**TINY)
    m = BertForMaskedLM.from_config(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = m.init_params({"params": rng, "dropout": rng}, {"input_ids": ids})
    out = m.apply({"params": params}, input_ids=ids, deterministic=True)
    assert out["logits"].shape == (2, 8, 200)


def test_bert_parity_vs_torch():
    """≤1e-3 logit parity vs HF torch BERT (BASELINE.md target); observed ~1e-6."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BertConfig(**TINY)
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()
    ids = np.random.RandomState(0).randint(0, 200, (2, 16))
    mask = np.ones((2, 16), dtype=np.int64)
    mask[1, 10:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))

    from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
    cfg = BertConfig(**hf_cfg.to_dict())
    m = BertModel.from_config(cfg, dtype=jnp.float32)
    params = convert_bert_backbone(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  attention_mask=jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), ref.pooler_output.numpy(), atol=2e-4)


def test_bert_pytorch_export_roundtrip():
    """native → pytorch_model.bin → native must be identity."""
    import tempfile
    import os
    from easynlp_tpu.modelzoo.models.bert.conversion import convert_bert_backbone
    from easynlp_tpu.utils.exporter import export_bert_backbone_to_pytorch

    cfg = BertConfig(**TINY)
    m = BertModel.from_config(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = m.init_params({"params": rng, "dropout": rng}, {"input_ids": ids})
    from flax import linen as nn
    params = nn.unbox(params)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pytorch_model.bin")
        export_bert_backbone_to_pytorch(params, cfg, path)
        import torch
        state = {k: v.numpy() for k, v in
                 torch.load(path, weights_only=True).items()}
        back = convert_bert_backbone(state, cfg)
    import jax as _jax
    flat_a = _jax.tree_util.tree_leaves_with_path(params)
    from flax.traverse_util import flatten_dict
    fa, fb = flatten_dict(params), flatten_dict(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=1e-6, err_msg=str(k))
