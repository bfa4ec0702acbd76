"""GPipe pipeline parallelism over a `pipeline` mesh axis — parity vs
sequential stage application, gradients through the schedule, and a
transformer-block stage function. Beyond-reference capability (the
reference has no PP; SURVEY.md §2.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.parallel.mesh import (build_mesh, get_global_mesh,
                                       set_global_mesh)
from easynlp_tpu.parallel.pipeline import gpipe, place_stage_stacked


@pytest.fixture
def restore_mesh():
    prev = get_global_mesh()
    yield
    set_global_mesh(prev)


def _mlp_stage(params, x):
    # slab semantics: one layer per stage → leading dim 1
    h = jnp.tanh(x @ params["w1"][0] + params["b1"][0])
    return h @ params["w2"][0] + params["b2"][0]


def _stacked_mlp(s=4, d=8, h=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w1": jnp.asarray(rng.randn(s, d, h) * 0.3, jnp.float32),
        "b1": jnp.zeros((s, h), jnp.float32),
        "w2": jnp.asarray(rng.randn(s, h, d) * 0.3, jnp.float32),
        "b2": jnp.zeros((s, d), jnp.float32),
    }


def _sequential(stacked, x, s):
    for i in range(s):
        x = _mlp_stage(jax.tree.map(lambda p, i=i: p[i:i + 1], stacked), x)
    return x


def test_gpipe_matches_sequential(restore_mesh):
    s = 4
    mesh = build_mesh({"data": 2, "pipeline": s})
    set_global_mesh(mesh)
    stacked = place_stage_stacked(_stacked_mlp(s), mesh)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 8), jnp.float32)
    ref = _sequential(jax.device_get(stacked), x, s)
    for m in (1, 2, 4):  # microbatch counts incl. degenerate M=1
        out = gpipe(_mlp_stage, stacked, x, mesh, num_microbatches=m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg="M=%d" % m)


def test_gpipe_gradients_match(restore_mesh):
    s, m = 4, 2
    mesh = build_mesh({"data": 2, "pipeline": s})
    set_global_mesh(mesh)
    stacked_host = _stacked_mlp(s, seed=2)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 8), jnp.float32)

    def loss_pp(p):
        return jnp.mean(gpipe(_mlp_stage, p, x, mesh, m) ** 2)

    def loss_seq(p):
        return jnp.mean(_sequential(p, x, s) ** 2)

    stacked = place_stage_stacked(stacked_host, mesh)
    l_pp, g_pp = jax.value_and_grad(loss_pp)(stacked)
    l_seq, g_seq = jax.value_and_grad(loss_seq)(stacked_host)
    assert abs(float(l_pp) - float(l_seq)) < 1e-6
    for a, b in zip(jax.tree.leaves(jax.device_get(g_pp)),
                    jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gpipe_transformer_stage(restore_mesh):
    """PP over real transformer blocks: stage_fn applies one BERT-style
    layer (attention + MLP) per stage via a flax module."""
    from flax import linen as nn

    from easynlp_tpu.modelzoo.models.bert.modeling_bert import BertLayer
    from easynlp_tpu.testing import tiny_bert_config

    s = 4
    cfg = tiny_bert_config(hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    # BertLayer is a scan body: carry = (hidden, kv_mask)
    layer = BertLayer(config=cfg, dtype=jnp.float32, deterministic=True)
    rng = jax.random.PRNGKey(0)
    b, sq, d = 4, 8, cfg.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(1), (b, sq, d), jnp.float32)
    mask = jnp.ones((b, sq), bool)

    def stage_fn(params, h):
        # mask derives from h's (local microbatch) shape — a closure over
        # the global-batch mask would mismatch inside shard_map
        one = jax.tree.map(lambda p: p[0], params)
        (h2, _), _ = layer.apply(
            {"params": one}, (h, jnp.ones(h.shape[:2], bool)))
        return h2

    # independent per-stage layer params, stacked on a leading S dim
    per_stage = []
    for i in range(s):
        v = layer.init({"params": jax.random.PRNGKey(10 + i),
                        "dropout": rng}, (x, mask))
        per_stage.append(nn.unbox(v["params"]))
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *per_stage)

    ref = x
    for i in range(s):
        ref = stage_fn(jax.tree.map(lambda p, i=i: p[i:i + 1], stacked), ref)

    mesh = build_mesh({"data": 2, "pipeline": s})
    set_global_mesh(mesh)
    out = gpipe(stage_fn, place_stage_stacked(stacked, mesh), x, mesh,
                num_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gpipe_multiple_layers_per_stage(restore_mesh):
    """8 stacked layers over 4 stages (slab of 2 per stage, scanned inside
    the stage function) — the layout a scanned encoder's [L, ...] params
    pipeline with zero re-packing."""
    total_layers, s = 8, 4
    rng = np.random.RandomState(7)
    stacked = {"w": jnp.asarray(rng.randn(total_layers, 8, 8) * 0.2,
                                jnp.float32)}
    x = jnp.asarray(rng.randn(8, 8), jnp.float32)

    def stage_fn(slab, h):
        def body(carry, w):
            return jnp.tanh(carry @ w), None
        out, _ = jax.lax.scan(body, h, slab["w"])
        return out

    ref = x
    for i in range(total_layers):
        ref = jnp.tanh(ref @ stacked["w"][i])

    mesh = build_mesh({"data": 2, "pipeline": s})
    set_global_mesh(mesh)
    out = gpipe(stage_fn, place_stage_stacked(stacked, mesh), x, mesh,
                num_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gpipe_full_training_step(restore_mesh):
    """An actual pipelined TRAIN step: embeddings + classifier head
    replicated, the encoder-layer stack pipelined over 4 stages; gradients
    flow through all three segments, loss parity vs the sequential model,
    and a few adam steps reduce the loss."""
    import optax
    from flax import linen as nn

    from easynlp_tpu.modelzoo.models.bert.modeling_bert import (
        BertEmbeddings, BertLayer)
    from easynlp_tpu.testing import tiny_bert_config

    s, total_layers = 4, 4
    cfg = tiny_bert_config(hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    b, sq = 8, 8
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, sq), 1, 900)
    tt = jnp.zeros((b, sq), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(sq), (b, sq))
    labels = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, 2)

    embed = BertEmbeddings(config=cfg, dtype=jnp.float32)
    layer = BertLayer(config=cfg, dtype=jnp.float32, deterministic=True)
    e_params = nn.unbox(embed.init(
        {"params": rng, "dropout": rng}, ids, tt, pos, True)["params"])
    x0 = embed.apply({"params": e_params}, ids, tt, pos, True)
    stacked = jax.tree.map(
        lambda *ls: jnp.stack(ls),
        *[nn.unbox(layer.init({"params": jax.random.PRNGKey(20 + i),
                               "dropout": rng},
                              (x0, jnp.ones((b, sq), bool)))["params"])
          for i in range(total_layers)])
    head = {"w": jnp.zeros((cfg.hidden_size, 2), jnp.float32),
            "b": jnp.zeros((2,), jnp.float32)}

    def stage_fn(slab, h):
        def body(carry, lp):
            (h2, _), _ = layer.apply(
                {"params": lp}, (carry, jnp.ones(carry.shape[:2], bool)))
            return h2, None
        out, _ = jax.lax.scan(body, h, slab)
        return out

    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(labels.shape[0]), labels])

    mesh = build_mesh({"data": 2, "pipeline": s})
    set_global_mesh(mesh)

    def loss_pp(params):
        h = embed.apply({"params": params["embed"]}, ids, tt, pos, True)
        h = gpipe(stage_fn, params["blocks"], h, mesh, num_microbatches=2)
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return ce(logits, labels)

    def loss_seq(params):
        h = embed.apply({"params": params["embed"]}, ids, tt, pos, True)
        h = stage_fn(params["blocks"], h)  # scan over ALL layers at once
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return ce(logits, labels)

    params = {"embed": e_params, "head": head,
              "blocks": place_stage_stacked(stacked, mesh)}
    params_host = {"embed": e_params, "head": head, "blocks": stacked}

    l_pp, g_pp = jax.value_and_grad(loss_pp)(params)
    l_seq, g_seq = jax.value_and_grad(loss_seq)(params_host)
    assert abs(float(l_pp) - float(l_seq)) < 1e-6
    for a, bb in zip(jax.tree.leaves(jax.device_get(g_pp)),
                     jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)

    # train: loss decreases through one jitted pipelined step, repeated
    tx = optax.adam(5e-3)
    state = tx.init(params)

    @jax.jit
    def train_step(p, st):
        l, g = jax.value_and_grad(loss_pp)(p)
        updates, st = tx.update(g, st, p)
        return optax.apply_updates(p, updates), st, l

    p = params
    l0 = float(loss_pp(p))
    for _ in range(6):
        p, state, _ = train_step(p, state)
    assert float(loss_pp(p)) < l0
