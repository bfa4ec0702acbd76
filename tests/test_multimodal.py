import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.testing import make_args

VISION_TINY = dict(image_size=16, patch_size=8, hidden_size=16,
                   num_hidden_layers=1, num_attention_heads=2,
                   intermediate_size=32, hidden_act="quick_gelu")
TEXT_TINY = dict(vocab_size=60, hidden_size=16, num_hidden_layers=1,
                 num_attention_heads=2, intermediate_size=32,
                 max_position_embeddings=32, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0)
GPT_TINY = dict(vocab_size=60, n_positions=128, n_embd=16, n_layer=1,
                n_head=2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)


def test_clip4clip_video_retrieval():
    make_args()
    from easynlp_tpu.appzoo.text2video_retrieval.model import Text2VideoRetrieval
    from easynlp_tpu.modelzoo.models.clip import CLIPConfig
    cfg = CLIPConfig(text_config=TEXT_TINY, vision_config=VISION_TINY,
                     projection_dim=8)
    module = Text2VideoRetrieval.build_module(cfg, dtype=jnp.float32)
    params = Text2VideoRetrieval.init_params(module, cfg)
    app = Text2VideoRetrieval(module, params, cfg)
    batch = {"input_ids": np.ones((2, 6), np.int32),
             "attention_mask": np.ones((2, 6), np.int32),
             "token_type_ids": np.zeros((2, 6), np.int32),
             "pixel_values": np.random.RandomState(0).rand(
                 2, 3, 16, 16, 3).astype(np.float32)}
    out = app.forward(batch)
    assert out["video_embeds"].shape == (2, 8)
    assert out["logits_per_text"].shape == (2, 2)
    loss = Text2VideoRetrieval.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_image_captioning():
    make_args()
    from easynlp_tpu.appzoo.image2text_generation.model import (
        CLIPGPTImageTextGeneration, I2TConfig)
    cfg = I2TConfig(vision_config=VISION_TINY, gpt_config=GPT_TINY)
    module = CLIPGPTImageTextGeneration.build_module(cfg, dtype=jnp.float32)
    params = CLIPGPTImageTextGeneration.init_params(module, cfg)
    app = CLIPGPTImageTextGeneration(module, params, cfg)
    batch = {"pixel_values": np.random.RandomState(0).rand(
        2, 16, 16, 3).astype(np.float32),
        "input_ids": np.ones((2, 6), np.int32),
        "attention_mask": np.ones((2, 6), np.int32)}
    out = app.forward(batch)
    assert out["logits"].shape == (2, 6, 60)
    loss = CLIPGPTImageTextGeneration.loss_fn(out, batch)["loss"]
    assert np.isfinite(float(loss))


def test_video_captioning():
    make_args()
    from easynlp_tpu.appzoo.video2text_generation.model import (
        CLIPGPTFrameTextGeneration)
    from easynlp_tpu.appzoo.image2text_generation.model import I2TConfig
    cfg = I2TConfig(vision_config=VISION_TINY, gpt_config=GPT_TINY)
    module = CLIPGPTFrameTextGeneration.build_module(cfg, dtype=jnp.float32)
    params = CLIPGPTFrameTextGeneration.init_params(module, cfg)
    app = CLIPGPTFrameTextGeneration(module, params, cfg)
    batch = {"pixel_values": np.random.RandomState(0).rand(
        2, 2, 16, 16, 3).astype(np.float32),
        "input_ids": np.ones((2, 6), np.int32),
        "attention_mask": np.ones((2, 6), np.int32)}
    out = app.forward(batch)
    assert out["logits"].shape == (2, 6, 60)


def test_artist_text2image():
    make_args()
    from easynlp_tpu.appzoo.text2image_generation.model import (
        TextImageGeneration)
    from easynlp_tpu.modelzoo.models.artist import ARTISTConfig
    cfg = ARTISTConfig(text_vocab_size=60, image_vocab_size=32,
                       codebook_dim=8, vq_channels=8, vq_channel_mult=(1, 2),
                       vq_num_res_blocks=1,
                       gpt_config=dict(GPT_TINY, vocab_size=60 + 32))
    module = TextImageGeneration.build_module(cfg, dtype=jnp.float32)
    params = TextImageGeneration.init_params(module, cfg)
    app = TextImageGeneration(module, params, cfg)
    side = 8  # 2 levels → /2 downsample → 4x4 = 16 codes
    batch = {"input_ids": np.ones((2, 6), np.int32),
             "attention_mask": np.ones((2, 6), np.int32),
             "pixel_values": np.random.RandomState(0).rand(
                 2, side, side, 3).astype(np.float32)}
    out = app.forward(batch)
    n_codes = (side // 2) ** 2
    assert out["sequence"].shape == (2, 6 + n_codes)
    assert (np.asarray(out["image_codes"]) < 32).all()
    loss_dict = TextImageGeneration.loss_fn(out, batch)
    assert np.isfinite(float(loss_dict["loss"]))
    # VQ decode roundtrip shape
    codes = jnp.asarray(out["image_codes"]).reshape(2, side // 2, side // 2)
    pixels = module.apply({"params": app.params}, codes,
                          method=module.decode_codes)
    assert pixels.shape == (2, side, side, 3)


def test_glm_block_infilling():
    make_args()
    from easynlp_tpu.modelzoo.models.glm import (GLMConfig,
                                                 GLMForConditionalGeneration,
                                                 glm_attention_bias)
    cfg = GLMConfig(vocab_size=80, hidden_size=32, num_layers=2,
                    num_attention_heads=2, max_sequence_length=64,
                    embedding_dropout_prob=0.0, attention_dropout_prob=0.0,
                    output_dropout_prob=0.0)
    m = GLMForConditionalGeneration.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((2, 10), jnp.int32)
    params = m.init({"params": rng, "dropout": rng}, input_ids=ids,
                    prefix_lengths=jnp.array([4, 6]),
                    deterministic=True)["params"]
    from flax import linen as nn
    params = nn.unbox(params)
    out = m.apply({"params": params}, input_ids=ids,
                  prefix_lengths=jnp.array([4, 6]), deterministic=True)
    assert out["logits"].shape == (2, 10, 80)

    # bias semantics: inside prefix → bidirectional; after → causal
    bias = np.asarray(glm_attention_bias(jnp.array([3]), 6))[0, 0]
    assert bias[0, 2] == 0            # prefix sees prefix (forward)
    assert bias[2, 0] == 0
    assert bias[1, 4] < -1e29         # prefix cannot see part B
    assert bias[4, 2] == 0            # part B sees prefix
    assert bias[4, 5] < -1e29         # part B is causal
    assert bias[5, 4] == 0


def test_dkplm_knowledge_injection():
    make_args()
    from easynlp_tpu.modelzoo.models.dkplm import (DKPLMConfig,
                                                   DKPLMForPreTraining,
                                                   dkplm_pretrain_loss)
    cfg = DKPLMConfig(vocab_size=80, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, knowledge_emb_size=8,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    m = DKPLMForPreTraining.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b, s = 2, 10
    kwargs = dict(input_ids=jnp.ones((b, s), jnp.int32),
                  insert_know_emb=jnp.ones((b, s, 8), jnp.float32),
                  insert_know_position_mask=jnp.zeros((b, s), jnp.int32)
                  .at[:, 3:5].set(1))
    from flax import linen as nn
    params = nn.unbox(m.init({"params": rng, "dropout": rng},
                             deterministic=True, **kwargs)["params"])
    out = m.apply({"params": params}, deterministic=True, **kwargs)
    assert out["logits"].shape == (b, s, 80)
    # injection must change outputs only through entity positions
    out2 = m.apply({"params": params}, deterministic=True,
                   **dict(kwargs, insert_know_emb=jnp.zeros((b, s, 8))))
    assert not np.allclose(np.asarray(out["logits"]),
                           np.asarray(out2["logits"]))
    batch = {"label_ids": jnp.full((b, s), -100, jnp.int32).at[:, 3].set(5),
             "insert_know_labels": jnp.full((b, s), -100, jnp.int32)
             .at[:, 4].set(7)}
    ld = dkplm_pretrain_loss(out, batch)
    assert np.isfinite(float(ld["loss"]))
    assert "decode_know_loss" in ld


def test_megatron_bert_parity():
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.MegatronBertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.MegatronBertModel(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.megatron_bert import (
        MegatronBertConfig, MegatronBertModel, convert_megatron_bert)
    cfg = MegatronBertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    m = MegatronBertModel.from_config(cfg, dtype=jnp.float32)
    params = convert_megatron_bert(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(0).randint(0, 120, (2, 10))
    import torch as _t
    with _t.no_grad():
        ref = hf(input_ids=_t.tensor(ids)).last_hidden_state.numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  deterministic=True)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), ref,
                               atol=3e-4)


def test_textcnn():
    make_args()
    from easynlp_tpu.modelzoo.models.cnn.modeling_cnn import (TextCNNConfig,
                                                              TextCNNModel)
    cfg = TextCNNConfig(vocab_size=80, embedding_size=16,
                        kernel_sizes=(2, 3), num_filters=8,
                        hidden_dropout_prob=0.0)
    m = TextCNNModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((2, 12), jnp.int32)
    from flax import linen as nn
    params = nn.unbox(m.init({"params": rng, "dropout": rng}, input_ids=ids,
                             deterministic=True)["params"])
    out = m.apply({"params": params}, input_ids=ids, deterministic=True)
    assert out["pooler_output"].shape == (2, 16)


def test_bloom_parity():
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BloomConfig(vocab_size=130, hidden_size=32,
                                      n_layer=2, n_head=4, hidden_dropout=0.0,
                                      attention_dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.BloomForCausalLM(hf_cfg).eval()
    from easynlp_tpu.modelzoo.models.bloom import (BloomConfig,
                                                   BloomForCausalLM,
                                                   convert_bloom_state_dict)
    cfg = BloomConfig(vocab_size=130, hidden_size=32, n_layer=2, n_head=4,
                      hidden_dropout=0.0, attention_dropout=0.0)
    m = BloomForCausalLM.from_config(cfg, dtype=jnp.float32)
    params = convert_bloom_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.random.RandomState(0).randint(3, 130, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, :3] = 0
    import torch as _t
    with _t.no_grad():
        ref = hf(input_ids=_t.tensor(ids),
                 attention_mask=_t.tensor(mask)).logits.numpy()
    out = m.apply({"params": params}, input_ids=jnp.asarray(ids),
                  attention_mask=jnp.asarray(mask, jnp.int32),
                  deterministic=True)
    got = np.asarray(out["logits"])
    valid = mask.astype(bool)
    assert np.abs(got - ref)[valid].max() < 3e-4


def test_kbert_visible_matrix():
    make_args()
    from easynlp_tpu.modelzoo.models.kbert import KBertConfig, KBertModel
    from flax import linen as nn
    cfg = KBertConfig(vocab_size=80, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    m = KBertModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b, s = 2, 8
    ids = jnp.arange(1, 1 + b * s).reshape(b, s) % 70
    vm = np.ones((b, s, s), np.int32)
    vm[:, :4, 4:] = 0  # first 4 tokens cannot see the knowledge branch
    vm[:, 4:, :4] = 0
    params = nn.unbox(m.init({"params": rng, "dropout": rng}, input_ids=ids,
                             visible_matrix=jnp.asarray(vm),
                             deterministic=True)["params"])
    out = m.apply({"params": params}, input_ids=ids,
                  visible_matrix=jnp.asarray(vm), deterministic=True)
    # changing the HIDDEN branch's tokens must not affect the visible block
    ids2 = ids.at[:, 5].set(7)
    out2 = m.apply({"params": params}, input_ids=ids2,
                   visible_matrix=jnp.asarray(vm), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"][:, :4]),
        np.asarray(out2["last_hidden_state"][:, :4]), atol=1e-6)
    # ...but does affect its own block
    assert not np.allclose(np.asarray(out["last_hidden_state"][:, 4:]),
                           np.asarray(out2["last_hidden_state"][:, 4:]))
