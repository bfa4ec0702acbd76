"""Raw MFU + attention-path probes (scratch)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

def bench(fn, *a, n=20, warm=3):
    for _ in range(warm):
        out = fn(*a)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000

rng = np.random.RandomState(0)
M, K, N = 16384, 768, 3072
a = jnp.asarray(rng.rand(M, K), jnp.bfloat16)
w1 = jnp.asarray(rng.rand(K, N), jnp.bfloat16)
w2 = jnp.asarray(rng.rand(N, K), jnp.bfloat16)

@jax.jit
def mm_chain(a, w1, w2):
    x = a
    for _ in range(12):
        x = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = jnp.dot(x, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x

ms = bench(mm_chain, a, w1, w2)
fl = 12 * 2 * (2 * M * K * N)
print("mm chain (bf16, f32 acc): %7.2f ms  -> %.1f TFLOP/s" % (ms, fl / ms / 1e9))

@jax.jit
def mm_chain_bf16acc(a, w1, w2):
    x = a
    for _ in range(12):
        x = jnp.dot(x, w1)
        x = jnp.dot(x, w2)
    return x

ms = bench(mm_chain_bf16acc, a, w1, w2)
print("mm chain (bf16 acc)     : %7.2f ms  -> %.1f TFLOP/s" % (ms, fl / ms / 1e9))

# attention at bench shape
from easynlp_tpu.ops.attention import attention_reference, _flash_attention, attention
B, S, H, D = 128, 128, 12, 64
q = jnp.asarray(rng.rand(B, S, H, D), jnp.bfloat16)
k = jnp.asarray(rng.rand(B, S, H, D), jnp.bfloat16)
v = jnp.asarray(rng.rand(B, S, H, D), jnp.bfloat16)
mask = jnp.ones((B, S), bool)

ref = jax.jit(lambda q, k, v: attention_reference(q, k, v, kv_mask=mask))
print("attn reference fwd      : %7.2f ms" % bench(ref, q, k, v))

fl128 = jax.jit(lambda q, k, v: attention(q, k, v, kv_mask=mask, impl="flash",
                                          block_q=128, block_k=128))
print("attn flash bq=bk=128    : %7.2f ms" % bench(fl128, q, k, v))

# fwd+bwd of attention alone
gref = jax.jit(jax.grad(lambda q, k, v: attention_reference(q, k, v, kv_mask=mask).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
print("attn reference f+b      : %7.2f ms" % bench(gref, q, k, v))
gfl = jax.jit(jax.grad(lambda q, k, v: attention(q, k, v, kv_mask=mask, impl="flash", block_q=128, block_k=128).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
print("attn flash f+b          : %7.2f ms" % bench(gfl, q, k, v))
