"""Multi-chip *correctness* (not just liveness): the sharded programs must
produce the same numbers as single-device execution.

- full train step: dp2 x fsdp2 x tp2 mesh vs 1 device — loss + updated params
- model-level TP logit parity: BERT and GLM under tensor=2
- beam decode under a sharded mesh matches single-device tokens

GSPMD inserts the collectives, so parity certifies that the logical-axis
rules (parallel/sharding.py) partition every matmul/embedding consistently —
the multi-chip analogue of the reference's hand-written mpu layers
(reference models/mg_glm/mpu_transformer.py:154-491).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.parallel.mesh import (build_mesh, get_global_mesh,
                                       set_global_mesh)


@pytest.fixture
def restore_mesh():
    prev = get_global_mesh()
    yield
    set_global_mesh(prev)


def _no_dropout_bert(**over):
    from easynlp_tpu.testing import tiny_bert_config
    return tiny_bert_config(hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0, **over)


def _cls_app(config):
    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification, SequenceClassificationModule)
    module = SequenceClassificationModule(config=config, dtype=jnp.float32,
                                          num_labels=2)
    params = SequenceClassification.init_params(module, config)
    return SequenceClassification(module, params, config)


def _trainer_on_mesh(mesh_spec, devices=None, **args_over):
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import SyntheticClassificationDataset, make_args

    mesh = build_mesh(mesh_spec, devices=devices)
    set_global_mesh(mesh)
    config = _no_dropout_bert()
    app = _cls_app(config)
    args = make_args(micro_batch_size=8, sequence_length=16, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9, checkpoint_dir=None,
                     gradient_accumulation_steps=2, **args_over)
    args.global_mesh = mesh
    ds = SyntheticClassificationDataset(n=32, seq_len=16,
                                        vocab_size=config.vocab_size)
    return Trainer(app, ds, evaluator=None, args=args), mesh


def test_sharded_train_step_matches_single_device(restore_mesh):
    """Same init, same batch: the dp2xfsdp2xtp2 step must produce the same
    loss and updated params as the 1-device step (tolerance = fp32 reduction
    reordering)."""
    tr1, _ = _trainer_on_mesh({"data": 1}, devices=jax.devices()[:1])
    batch = next(iter(tr1.train_loader))
    batch.pop("_valid", None)
    p1, o1, m1 = tr1._train_step(tr1.params, tr1.opt_state,
                                 jax.device_put(batch, tr1.batch_shard), 0)
    loss1 = float(m1["loss"])
    params1 = jax.device_get(p1)

    tr8, _ = _trainer_on_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    p8, o8, m8 = tr8._train_step(tr8.params, tr8.opt_state,
                                 jax.device_put(batch, tr8.batch_shard), 0)
    loss8 = float(m8["loss"])
    params8 = jax.device_get(p8)

    assert abs(loss1 - loss8) < 1e-5, (loss1, loss8)
    flat1 = jax.tree_util.tree_leaves_with_path(params1)
    flat8 = jax.tree.leaves(params8)
    assert len(flat1) == len(flat8)
    for (path, a), b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="param mismatch at %s" % jax.tree_util.keystr(path))


def _tp_logit_parity(make_model, make_inputs, atol):
    """Forward the same module with replicated params (1 device) and with
    TP-sharded params (tensor=2 mesh); logits must agree."""
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    module, params, logical_axes = make_model()
    inputs = make_inputs()

    ref = module.apply({"params": params}, **inputs, deterministic=True)

    mesh = build_mesh({"data": 2, "tensor": 2},
                      devices=jax.devices()[:4])
    set_global_mesh(mesh)
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, logical_axes, is_leaf=lambda x: x is None)
    out = jax.jit(
        lambda p, inp: module.apply({"params": p}, **inp,
                                    deterministic=True))(placed, inputs)

    key = "logits" if "logits" in ref else "last_hidden_state"
    np.testing.assert_allclose(np.asarray(out[key]), np.asarray(ref[key]),
                               atol=atol)


def _boxed_axes(module, init_kwargs):
    """Init with boxing to recover per-param logical axes, return
    (unboxed_params, axes_tree)."""
    from flax import linen as nn
    from easynlp_tpu.appzoo.application import extract_logical_axes

    rng = jax.random.PRNGKey(0)
    boxed = module.init({"params": rng, "dropout": rng}, **init_kwargs)
    axes = extract_logical_axes(boxed["params"])
    return nn.unbox(boxed["params"]), axes


def test_tp_bert_logit_parity(restore_mesh):
    def make_model():
        from easynlp_tpu.appzoo.sequence_classification.model import (
            SequenceClassificationModule)
        cfg = _no_dropout_bert()
        module = SequenceClassificationModule(config=cfg, dtype=jnp.float32,
                                              num_labels=3)
        params, axes = _boxed_axes(
            module, dict(input_ids=jnp.ones((1, 8), jnp.int32),
                         deterministic=True))
        return module, params, axes

    def make_inputs():
        rng = np.random.RandomState(0)
        return dict(input_ids=jnp.asarray(rng.randint(1, 900, (4, 16)),
                                          jnp.int32),
                    attention_mask=jnp.ones((4, 16), jnp.int32))

    _tp_logit_parity(make_model, make_inputs, atol=2e-5)


def test_tp_glm_logit_parity(restore_mesh):
    def make_model():
        from easynlp_tpu.modelzoo.models.glm import GLMConfig
        from easynlp_tpu.modelzoo.models.glm.modeling_glm import (
            GLMForConditionalGeneration)
        cfg = GLMConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_attention_heads=4, max_sequence_length=32,
                        embedding_dropout_prob=0.0,
                        attention_dropout_prob=0.0,
                        output_dropout_prob=0.0)
        module = GLMForConditionalGeneration(config=cfg, dtype=jnp.float32)
        params, axes = _boxed_axes(
            module, dict(input_ids=jnp.ones((1, 8), jnp.int32),
                         deterministic=True))
        return module, params, axes

    def make_inputs():
        rng = np.random.RandomState(1)
        return dict(input_ids=jnp.asarray(rng.randint(1, 60, (2, 16)),
                                          jnp.int32))

    _tp_logit_parity(make_model, make_inputs, atol=2e-5)


def test_beam_decode_under_sharded_mesh(restore_mesh):
    """Beam search (lax.while_loop program) must produce identical tokens when
    params are TP/DP-sharded over a mesh."""
    from flax import linen as nn

    from easynlp_tpu.modelzoo.generation_utils import generate
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    boxed = m.init({"params": rng, "dropout": rng},
                   input_ids=jnp.ones((1, 4), jnp.int32),
                   deterministic=True)
    from easynlp_tpu.appzoo.application import extract_logical_axes
    axes = extract_logical_axes(boxed["params"])
    params = nn.unbox(boxed["params"])
    prefill, decode = make_gpt2_generation_fns(m, 16)

    pids = np.array([[5, 6, 7, 8], [9, 10, 11, 12]], np.int32)
    pmask = np.ones_like(pids)
    kw = dict(max_length=16, num_beams=3, eos_token_id=95, pad_token_id=0)
    ref = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                              jnp.asarray(pmask), **kw))

    mesh = build_mesh({"data": 2, "tensor": 2}, devices=jax.devices()[:4])
    set_global_mesh(mesh)
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, axes, is_leaf=lambda x: x is None)
    out = np.asarray(generate(prefill, decode, placed, jnp.asarray(pids),
                              jnp.asarray(pmask), **kw))
    np.testing.assert_array_equal(out, ref)


def test_speculative_decode_under_sharded_mesh(restore_mesh):
    """Speculative greedy (chunked verify + shared-accept rollback) must
    produce identical tokens when params are TP/DP-sharded — the accept min
    becomes a cross-device reduction under GSPMD."""
    from flax import linen as nn

    from easynlp_tpu.modelzoo.generation_utils import generate
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    boxed = m.init({"params": rng, "dropout": rng},
                   input_ids=jnp.ones((1, 4), jnp.int32),
                   deterministic=True)
    from easynlp_tpu.appzoo.application import extract_logical_axes
    axes = extract_logical_axes(boxed["params"])
    params = nn.unbox(boxed["params"])
    prefill, decode = make_gpt2_generation_fns(m, 20, cache_slack=5)

    # repetitive prompts so drafts actually get accepted
    pids = np.array([[5, 6, 5, 6], [9, 10, 9, 10]], np.int32)
    pmask = np.ones_like(pids)
    kw = dict(max_length=20, pad_token_id=0, eos_token_id=95,
              speculative="prompt_lookup", num_draft_tokens=4)
    ref = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                              jnp.asarray(pmask), **kw))

    mesh = build_mesh({"data": 2, "tensor": 2}, devices=jax.devices()[:4])
    set_global_mesh(mesh)
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, axes, is_leaf=lambda x: x is None)
    out = np.asarray(generate(prefill, decode, placed, jnp.asarray(pids),
                              jnp.asarray(pmask), **kw))
    np.testing.assert_array_equal(out, ref)


# ---- composed 3-axis meshes (round-4): the combinations a real multi-pod
# configuration would use — mirrored as dryrun legs in __graft_entry__.py


def test_tp_pp_data_composed_parity(restore_mesh):
    """GPipe stages whose weights are column-sharded over `tensor`
    (stage_fn all-gathers its TP shard): fwd + grad parity vs the
    sequential unsharded stages on a data2 x pipeline2 x tensor2 mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from easynlp_tpu.parallel.pipeline import gpipe

    mesh = build_mesh({"data": 2, "pipeline": 2, "tensor": 2},
                      devices=jax.devices()[:8])
    set_global_mesh(mesh)
    prng = np.random.RandomState(1)
    stacked = {"w": jnp.asarray(prng.randn(2, 8, 8) * 0.3, jnp.float32),
               "b": jnp.asarray(prng.randn(2, 8) * 0.1, jnp.float32)}

    def stage_tp(p, h):
        y = jnp.tanh(h @ p["w"][0] + p["b"][0])
        return jax.lax.all_gather(y, "tensor", axis=1, tiled=True)

    def stage_ref(p, h):
        return jnp.tanh(h @ p["w"][0] + p["b"][0])

    x = jnp.asarray(prng.randn(8, 8), jnp.float32)
    ref = x
    for i in range(2):
        ref = stage_ref(jax.tree.map(lambda p, i=i: p[i:i + 1], stacked),
                        ref)
    specs = {"w": P("pipeline", None, "tensor"), "b": P("pipeline", "tensor")}
    placed = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        stacked, specs)
    out = gpipe(stage_tp, placed, x, mesh, num_microbatches=2,
                param_specs=specs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def pp_loss(p):
        return jnp.mean(gpipe(stage_tp, p, x, mesh, num_microbatches=2,
                              param_specs=specs) ** 2)

    def seq_loss(p):
        h = x
        for i in range(2):
            h = stage_ref(jax.tree.map(lambda q, i=i: q[i:i + 1], p), h)
        return jnp.mean(h ** 2)

    g_pp = jax.device_get(jax.jit(jax.grad(pp_loss))(placed))
    g_seq = jax.grad(seq_loss)(stacked)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ep_fsdp_data_composed_parity(restore_mesh):
    """Switch-MoE on expert2 x fsdp2 x data2: logits AND grads must match
    the unsharded computation."""
    from flax import linen as nn

    from easynlp_tpu.appzoo.application import extract_logical_axes
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    cfg = GPT2Config(vocab_size=64, n_positions=32, n_embd=16, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0, num_experts=2,
                     expert_capacity_factor=4.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    boxed = m.init({"params": rng, "dropout": rng},
                   input_ids=jnp.ones((1, 4), jnp.int32), deterministic=True)
    params = nn.unbox(boxed["params"])
    axes = extract_logical_axes(boxed["params"])
    ids = jax.random.randint(jax.random.PRNGKey(7), (4, 8), 0, 64)

    def loss(p):
        out = m.apply({"params": p}, input_ids=ids, deterministic=True)
        return jnp.mean(out["logits"] ** 2) + out["moe_aux_loss"], \
            out["logits"]

    (_, ref_logits), ref_grads = jax.value_and_grad(loss, has_aux=True)(
        params)
    mesh = build_mesh({"data": 2, "fsdp": 2, "expert": 2},
                      devices=jax.devices()[:8])
    set_global_mesh(mesh)
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, axes, is_leaf=lambda x: x is None)
    (_, logits), grads = jax.jit(jax.value_and_grad(loss, has_aux=True))(
        placed)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(grads)),
                    jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sp_tp_data_composed_parity(restore_mesh):
    """Ring attention (sequence axis) composed with TP matmul sharding:
    forward parity vs single-device plain attention."""
    from flax import linen as nn

    from easynlp_tpu.appzoo.application import extract_logical_axes
    from easynlp_tpu.modelzoo.models.bert import BertModel
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    cfg = _no_dropout_bert(use_ring_attention=True)
    m = BertModel(config=cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 32), 1, 900)
    set_global_mesh(build_mesh({"data": 1}, devices=jax.devices()[:1]))
    boxed = m.init({"params": rng, "dropout": rng}, ids, deterministic=True)
    params = nn.unbox(boxed["params"])
    axes = extract_logical_axes(boxed["params"])
    ref = m.apply({"params": params}, ids, deterministic=True)

    mesh = build_mesh({"data": 2, "sequence": 2, "tensor": 2},
                      devices=jax.devices()[:8])
    set_global_mesh(mesh)
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, axes, is_leaf=lambda x: x is None)
    out = jax.jit(lambda p: m.apply({"params": p}, ids,
                                    deterministic=True))(placed)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]),
                               np.asarray(ref["last_hidden_state"]),
                               atol=2e-5)


def test_beam_decode_under_3axis_mesh(restore_mesh):
    """Beam search token-exact when params live on a data2 x fsdp2 x
    tensor2 mesh (3 composed axes, vs the 2-axis test above)."""
    from flax import linen as nn

    from easynlp_tpu.appzoo.application import extract_logical_axes
    from easynlp_tpu.modelzoo.generation_utils import generate
    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    boxed = m.init({"params": rng, "dropout": rng},
                   input_ids=jnp.ones((1, 4), jnp.int32), deterministic=True)
    params = nn.unbox(boxed["params"])
    axes = extract_logical_axes(boxed["params"])
    prefill, decode = make_gpt2_generation_fns(m, 16)
    pids = np.array([[5, 6, 7, 8], [9, 10, 11, 12]], np.int32)
    pmask = np.ones_like(pids)
    kw = dict(max_length=16, num_beams=3, eos_token_id=95, pad_token_id=0)
    ref = np.asarray(generate(prefill, decode, params, jnp.asarray(pids),
                              jnp.asarray(pmask), **kw))
    mesh = build_mesh({"data": 2, "fsdp": 2, "tensor": 2},
                      devices=jax.devices()[:8])
    set_global_mesh(mesh)
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, axes, is_leaf=lambda x: x is None)
    out = np.asarray(generate(prefill, decode, placed, jnp.asarray(pids),
                              jnp.asarray(pmask), **kw))
    np.testing.assert_array_equal(out, ref)
