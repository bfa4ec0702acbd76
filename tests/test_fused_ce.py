import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from easynlp_tpu.ops.fused_ce import (
    chunked_softmax_ce,
    vocab_parallel_cross_entropy,
)
from easynlp_tpu.utils import losses


def _setup(n=8, e=16, v=50):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    hidden = jax.random.normal(k[0], (n, e), jnp.float32)
    emb = jax.random.normal(k[1], (v, e), jnp.float32)
    labels = jax.random.randint(k[2], (n,), 0, v)
    labels = labels.at[1].set(-100)
    return hidden, emb, labels


def test_chunked_ce_matches_dense():
    hidden, emb, labels = _setup()
    dense = losses.cross_entropy(hidden @ emb.T, labels)
    for chunk in (16, 33, 50, 8192):  # incl. non-dividing + padded chunks
        fused = chunked_softmax_ce(hidden, emb, labels, chunk)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                                   rtol=1e-5)


def test_chunked_ce_grads_match():
    hidden, emb, labels = _setup()

    def dense_loss(h, w):
        return losses.cross_entropy(h @ w.T, labels)

    def fused_loss(h, w):
        return chunked_softmax_ce(h, w, labels, 16)

    gd = jax.grad(dense_loss, argnums=(0, 1))(hidden, emb)
    gf = jax.grad(fused_loss, argnums=(0, 1))(hidden, emb)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gd[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gd[1]),
                               atol=1e-5)


def test_vocab_parallel_ce():
    from easynlp_tpu.parallel.compat import shard_map_compat
    from easynlp_tpu.parallel import build_mesh

    mesh = build_mesh({"tensor": 8})
    n, v = 8, 64
    k = jax.random.split(jax.random.PRNGKey(1), 2)
    logits = jax.random.normal(k[0], (n, v), jnp.float32)
    labels = jax.random.randint(k[1], (n,), 0, v).at[2].set(-100)
    expected = losses.cross_entropy(logits, labels)

    fn = shard_map_compat(
        lambda lg, lb: vocab_parallel_cross_entropy(lg, lb, "tensor")[None],
        mesh=mesh,
        in_specs=(P(None, "tensor"), P()),
        out_specs=P(),
    )
    got = fn(logits, labels)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5)
