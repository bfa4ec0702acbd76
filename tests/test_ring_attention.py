import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.ops.attention import attention_reference
from easynlp_tpu.ops.ring_attention import make_ring_attention
from easynlp_tpu.parallel import build_mesh


def _data(B=2, S=64, H=2, D=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.float32) for kk in ks)
    mask = jnp.arange(S)[None, :] < jnp.array([[64], [49]])[:, 0:1]
    return q, k, v, mask


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(causal):
    mesh = build_mesh({"sequence": 8})
    ring = make_ring_attention(mesh, causal=causal)
    q, k, v, mask = _data()
    got = ring(q, k, v, mask)
    want = attention_reference(q, k, v, kv_mask=mask, causal=causal)
    # padded key rows produce garbage for fully-masked queries; compare valid
    valid = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], atol=2e-5)


def test_ring_attention_grads():
    mesh = build_mesh({"sequence": 8})
    ring = make_ring_attention(mesh, causal=True)
    q, k, v, mask = _data(seed=1)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.where(mask[..., None, None], ring(q, k, v, mask),
                                 0.0) ** 2)

    def loss_full(q, k, v):
        o = attention_reference(q, k, v, kv_mask=mask, causal=True)
        return jnp.sum(jnp.where(mask[..., None, None], o, 0.0) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
