"""XLA attention formulation shoot-out at B=128,S=128,H=12,D=64 (scratch)."""
import time, math
import numpy as np
import jax, jax.numpy as jnp

def bench(fn, *a, n=50, warm=5):
    for _ in range(warm):
        out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000

rng = np.random.RandomState(0)
B, S, H, D = 128, 128, 12, 64
q = jnp.asarray(rng.rand(B, S, H, D), jnp.bfloat16)
k = jnp.asarray(rng.rand(B, S, H, D), jnp.bfloat16)
v = jnp.asarray(rng.rand(B, S, H, D), jnp.bfloat16)
mask = jnp.ones((B, S), bool)
scale = 1.0 / math.sqrt(D)

# v0: current reference
from easynlp_tpu.ops.attention import attention_reference
f0 = jax.jit(lambda q, k, v: attention_reference(q, k, v, kv_mask=mask))
print("v0 current reference          : %6.2f ms" % bench(f0, q, k, v))

# v1: no mask (is the where the cost?)
f1 = jax.jit(lambda q, k, v: attention_reference(q, k, v))
print("v1 no mask                    : %6.2f ms" % bench(f1, q, k, v))

# v2: bf16 logits end-to-end (softmax in fp32 on the fly via max-sub)
@jax.jit
def f2(q, k, v):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.bfloat16(scale)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(jnp.bfloat16), v)
print("v2 bf16 logits store          : %6.2f ms" % bench(f2, q, k, v))

# v3: explicit BHSD layout (transpose in/out once)
@jax.jit
def f3(q, k, v):
    qt = q.transpose(0, 2, 1, 3)  # BHSD
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vt)
    return out.transpose(0, 2, 1, 3)
print("v3 explicit BHSD              : %6.2f ms" % bench(f3, q, k, v))

# v4: flatten (B*H) batch dim
@jax.jit
def f4(q, k, v):
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    logits = jax.lax.dot_general(qt, kt, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    out = jax.lax.dot_general(probs, vt, (((2,), (1,)), ((0,), (0,))))
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)
print("v4 flat (B*H) batch dot       : %6.2f ms" % bench(f4, q, k, v))

# v5: jax.nn.dot_product_attention (XLA's own; may hit cudnn/TPU path)
try:
    f5 = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
    print("v5 jax.nn.dot_product_attention: %6.2f ms" % bench(f5, q, k, v))
except Exception as e:
    print("v5 unavailable:", e)

# v6: jax Pallas TPU flash attention from jax.experimental (if importable)
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jfa
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    f6 = jax.jit(lambda q_, k_, v_: jfa(q_, k_, v_, sm_scale=scale))
    print("v6 jax pallas flash (BHSD)    : %6.2f ms" % bench(f6, qt, kt, vt))
except Exception as e:
    print("v6 unavailable:", repr(e)[:120])

# correctness spot check
o0 = f0(q, k, v); o4 = f4(q, k, v)
print("v4 vs v0 max diff:", float(jnp.max(jnp.abs(o0.astype(jnp.float32) - o4.astype(jnp.float32)))))
