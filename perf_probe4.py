"""Measure Pallas per-grid-step overhead + prototype short-S attention kernel."""
import time, math, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
scale = 1.0 / math.sqrt(D)

# ---- grid overhead probe: identity copy, same total bytes, varying grid ----
x = jnp.asarray(rng.rand(B, H, S, D), jnp.bfloat16)  # 25MB

def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]

for g in (128, 32, 8, 1):
    bb = B // g
    f = jax.jit(pl.pallas_call(
        copy_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((bb, H, S, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, H, S, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), x.dtype)))
    print("copy grid=%4d : %6.3f ms" % (g, bench(f, x)))

# ---- short-S attention kernel: whole sequence resident, no online softmax --
def short_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    bb, h, s, d = q_ref.shape
    q = q_ref[...].reshape(bb * h, s, d)
    k = k_ref[...].reshape(bb * h, s, d)
    v = v_ref[...].reshape(bb * h, s, d)
    dims = (((2,), (2,)), ((0,), (0,)))
    logits = jax.lax.dot_general(q, k, dims, preferred_element_type=jnp.float32)
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    dims2 = (((2,), (1,)), ((0,), (0,)))
    o = jax.lax.dot_general(p, v, dims2, preferred_element_type=jnp.float32)
    o_ref[...] = o.reshape(bb, h, s, d).astype(o_ref.dtype)

q = jnp.asarray(rng.rand(B, H, S, D), jnp.bfloat16)
k = jnp.asarray(rng.rand(B, H, S, D), jnp.bfloat16)
v = jnp.asarray(rng.rand(B, H, S, D), jnp.bfloat16)

for bb in (2, 4, 8):
    g = B // bb
    spec = pl.BlockSpec((bb, H, S, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(pl.pallas_call(
        functools.partial(short_attn_kernel, scale=scale),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype)))
    ms = bench(f, q, k, v)
    print("short-attn bb=%2d (grid %3d): %6.3f ms" % (bb, g, ms))

# correctness vs reference
spec = pl.BlockSpec((4, H, S, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
f = jax.jit(pl.pallas_call(
    functools.partial(short_attn_kernel, scale=scale),
    grid=(B // 4,), in_specs=[spec, spec, spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype)))
out = f(q, k, v)
ref = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
ref = jax.nn.softmax(ref, axis=-1).astype(jnp.bfloat16)
ref = jnp.einsum("bhqk,bhkd->bhqd", ref, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
print("max diff vs einsum:", float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))))
