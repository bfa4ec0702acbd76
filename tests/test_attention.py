import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.ops.attention import attention, attention_reference


def _rand(shape, key):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference_fwd(causal):
    B, S, H, D = 1, 64, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
    mask = jnp.arange(S)[None, :] < 47
    ref = attention_reference(q, k, v, kv_mask=mask, causal=causal)
    fl = attention(q, k, v, kv_mask=mask, causal=causal, impl="flash",
                   block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_bwd():
    B, S, H, D = 1, 64, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
    mask = jnp.arange(S)[None, :] < 50

    def f(impl):
        def loss(q, k, v):
            o = attention(q, k, v, kv_mask=mask, causal=True, impl=impl,
                          block_q=32, block_k=32)
            return jnp.sum(o ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    gf = f("flash")
    gr = f("reference")
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_cross_attention_shapes():
    B, Sq, Skv, H, D = 2, 16, 48, 2, 8
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand((B, Sq, H, D), keys[0])
    k = _rand((B, Skv, H, D), keys[1])
    v = _rand((B, Skv, H, D), keys[2])
    out = attention(q, k, v, impl="reference")
    assert out.shape == (B, Sq, H, D)


def test_flash_non_divisible_length():
    """Sequence lengths not divisible by the block size must not read the
    padded tail (regression: NaN grads at S=3136 in the LDM UNet)."""
    B, S, H, D = 1, 70, 2, 16  # 70 % 32 != 0
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
    mask = jnp.ones((B, S), bool)

    def loss(q, impl):
        o = attention(q, k, v, kv_mask=mask, impl=impl, block_q=32, block_k=32)
        return jnp.sum(o ** 2)

    gf = jax.grad(lambda x: loss(x, "flash"))(q)
    gr = jax.grad(lambda x: loss(x, "reference"))(q)
    assert np.isfinite(np.asarray(gf)).all()
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4)


def test_flash_non_divisible_causal():
    B, S, H, D = 1, 70, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
    mask = jnp.arange(S)[None, :] < 66
    fl = attention(q, k, v, kv_mask=mask, causal=True, impl="flash",
                   block_q=32, block_k=32)
    ref = attention_reference(q, k, v, kv_mask=mask, causal=True)
    valid = np.asarray(mask)[0]
    np.testing.assert_allclose(np.asarray(fl)[0][valid],
                               np.asarray(ref)[0][valid], atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_short_matches_reference_fwd_bwd(causal):
    """The whole-sequence short kernel (auto path for 256<=Skv<=512 on TPU)
    must match the reference in both directions, incl. padding masks."""
    B, S, H, D = 2, 40, 3, 16  # not multiples of 8 / H odd
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
    mask = jnp.arange(S)[None, :] < jnp.asarray([[33], [40]])

    def f(impl):
        def loss(q, k, v):
            o = attention(q, k, v, kv_mask=mask, causal=causal, impl=impl)
            return jnp.sum(o ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    o_s = attention(q, k, v, kv_mask=mask, causal=causal, impl="short")
    o_r = attention_reference(q, k, v, kv_mask=mask, causal=causal)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_r), atol=2e-5)
    for a, b in zip(f("short"), f("reference")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_short_cross_attention_decode_shape():
    """Sq != Skv (causal decode step) through the short kernel."""
    B, Sq, Skv, H, D = 2, 1, 24, 2, 8
    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    q = _rand((B, Sq, H, D), keys[0])
    k = _rand((B, Skv, H, D), keys[1])
    v = _rand((B, Skv, H, D), keys[2])
    mask = jnp.arange(Skv)[None, :] < 20
    o_s = attention(q, k, v, kv_mask=mask, causal=True, impl="short")
    o_r = attention_reference(q, k, v, kv_mask=mask, causal=True)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_r), atol=2e-5)


def test_short_bhsd_layout():
    """layout='bhsd' accepts heads-major tensors and matches the canonical
    layout result."""
    B, S, H, D = 2, 32, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
    mask = jnp.arange(S)[None, :] < 30
    o_c = attention(q, k, v, kv_mask=mask, impl="short")
    o_t = attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), kv_mask=mask, impl="short",
                    layout="bhsd").transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(o_c), np.asarray(o_t), atol=1e-6)


def test_use_flash_attention_flag_override():
    """--use_flash_attention true|false overrides the platform auto-detect
    (flag was declared in arguments.py; this pins the wiring)."""
    from easynlp_tpu.ops import attention as A
    try:
        A.set_kernel_override(False)
        assert A.use_flash() is False
        A.set_kernel_override(True)
        assert A.use_flash() is True
        # forced-on + CPU: auto dispatch takes the short kernel in
        # interpret mode and still matches the reference
        B, S, H, D = 2, 280, 2, 16   # inside the short window (256..512)
        keys = jax.random.split(jax.random.PRNGKey(8), 3)
        q, k, v = (_rand((B, S, H, D), kk) for kk in keys)
        o_auto = attention(q, k, v, impl="auto")
        o_ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(o_auto), np.asarray(o_ref),
                                   atol=2e-5)
    finally:
        A.set_kernel_override(None)
