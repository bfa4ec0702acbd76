"""Multi-chip serving: continuous batching with tensor-parallel params.

The batcher's jitted step/admit functions take the param tree as an
argument, so sharding the params over a `tensor` axis makes XLA insert the
TP collectives inside the SAME compiled step — no serving-code changes.
Contract: token-for-token equality with the single-device batcher (greedy
AND per-request sampled streams), i.e. sharding is a pure execution-layout
choice. Reference parallel: the mg_glm stack only shards *training*;
serving there is single-GPU (reference easynlp/core/predictor.py:128-152).
"""

import numpy as np
import pytest


def _tiny_model():
    """TP-divisible tiny GPT-2 (every sharded dim divisible by tensor=2;
    the shared fixture's vocab 97 is not)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    deterministic=True)["params"]
    return m, nn.unbox(params)


def _tp_params(m, mesh):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from easynlp_tpu.appzoo.application import extract_logical_axes
    from easynlp_tpu.parallel.sharding import logical_to_sharding

    rng = jax.random.PRNGKey(0)
    boxed = m.init({"params": rng, "dropout": rng},
                   input_ids=jnp.ones((1, 4), jnp.int32),
                   deterministic=True)
    params = nn.unbox(boxed["params"])
    axes = extract_logical_axes(boxed["params"])
    placed = jax.tree.map(
        lambda p, a: jax.device_put(p, logical_to_sharding(a or (), mesh)),
        params, axes, is_leaf=lambda x: x is None)
    return placed


def test_continuous_decode_under_tp_mesh_is_token_exact():
    import jax

    from easynlp_tpu.parallel.mesh import build_mesh, set_global_mesh
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m, params = _tiny_model()

    rs = np.random.RandomState(2)
    prompts = [[int(x) for x in rs.randint(1, 95, size=rs.randint(3, 12))]
               for _ in range(6)]
    kw = dict(max_new_tokens=14,
              do_sample=[False, True, True, False, True, False],
              temperature=[1.0, 0.8, 1.2, 1.0, 0.6, 1.0],
              top_k=[0, 5, 0, 0, 10, 0],
              top_p=[1.0, 1.0, 0.9, 1.0, 0.95, 1.0],
              seed=[0, 1, 2, 3, 4, 5])

    single = build_mesh({"data": 1}, devices=jax.devices()[:1])
    set_global_mesh(single)
    dec = DeviceContinuousDecoder(m, params, max_slots=2, max_length=48,
                                  prompt_bucket=16, pad_token_id=0,
                                  chunk_size=4)
    want = dec(prompts, **kw)

    mesh = build_mesh({"data": 2, "tensor": 2}, devices=jax.devices()[:4])
    set_global_mesh(mesh)
    try:
        placed = _tp_params(m, mesh)
        dec_tp = DeviceContinuousDecoder(m, placed, max_slots=2,
                                         max_length=48, prompt_bucket=16,
                                         pad_token_id=0, chunk_size=4)
        got = dec_tp(prompts, **kw)
    finally:
        set_global_mesh(single)
    assert got == want


def test_thread_batcher_under_tp_mesh_is_token_exact():
    import jax

    from easynlp_tpu.parallel.mesh import build_mesh, set_global_mesh
    from easynlp_tpu.serving.continuous import ContinuousBatcher

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m, params = _tiny_model()
    rs = np.random.RandomState(4)
    prompts = [[int(x) for x in rs.randint(1, 95, size=rs.randint(3, 10))]
               for _ in range(4)]

    single = build_mesh({"data": 1}, devices=jax.devices()[:1])
    set_global_mesh(single)
    b = ContinuousBatcher(m, params, max_slots=2, max_length=48,
                          prompt_buckets=(16,), pad_token_id=0,
                          chunk_size=4)
    try:
        want = [b.submit(p, max_new_tokens=10, do_sample=(i % 2 == 1),
                         temperature=0.8, seed=i).result(timeout=300)
                for i, p in enumerate(prompts)]
    finally:
        b.stop()

    mesh = build_mesh({"tensor": 2}, devices=jax.devices()[:2])
    set_global_mesh(mesh)
    try:
        placed = _tp_params(m, mesh)
        b_tp = ContinuousBatcher(m, placed, max_slots=2, max_length=48,
                                 prompt_buckets=(16,), pad_token_id=0,
                                 chunk_size=4)
        try:
            got = [b_tp.submit(p, max_new_tokens=10, do_sample=(i % 2 == 1),
                               temperature=0.8, seed=i).result(timeout=300)
                   for i, p in enumerate(prompts)]
        finally:
            b_tp.stop()
    finally:
        set_global_mesh(single)
    assert got == want
