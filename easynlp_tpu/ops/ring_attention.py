"""Ring attention: sequence-parallel exact attention over a mesh axis.

A capability the reference does NOT have (SURVEY.md §5.7 — its long-sequence
story stops at activation checkpointing): context length scales linearly with
the number of chips. Q/K/V are sharded on the sequence dimension across the
`sequence` mesh axis; K/V chunks rotate around the ring via `ppermute` while
each device accumulates its queries' online-softmax statistics — O(S/n)
memory per chip, exact results, and the collective rides the ICI ring.

Written with lax collectives (not a Pallas RDMA kernel) so jax autodiff
produces the backward pass through the ring for free; use inside shard_map:

    fn = shard_map(
        lambda q, k, v, m: ring_attention(q, k, v, m, axis_name="sequence"),
        mesh=mesh,
        in_specs=(P(None, "sequence", None, None), ... , P(None, "sequence")),
        out_specs=P(None, "sequence", None, None))
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def ring_attention(q, k, v, kv_mask=None, axis_name="sequence", causal=False,
                   scale=None):
    """Per-shard shapes: q/k/v [B, S/n, H, D], kv_mask [B, S/n] bool.
    Returns the local shard of the attention output [B, S/n, H, D]."""
    b, s_local, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    n = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    if kv_mask is None:
        kv_mask = jnp.ones((b, s_local), bool)

    q32 = q.astype(jnp.float32) * scale
    perm = [(j, (j + 1) % n) for j in range(n)]

    q_pos = my * s_local + jnp.arange(s_local)          # global q positions

    def body(i, carry):
        acc, m_run, l_run, k_cur, v_cur, mask_cur = carry
        src_shard = (my - i) % n                         # whose chunk we hold
        k_pos = src_shard * s_local + jnp.arange(s_local)

        s = jnp.einsum("bqhd,bkhd->bhqk", q32, k_cur.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        s = jnp.where(mask_cur[:, None, None, :], s, NEG_INF)
        if causal:
            visible = k_pos[None, :] <= q_pos[:, None]
            s = jnp.where(visible[None, None], s, NEG_INF)

        m_cur = jnp.max(s, axis=-1)                      # [B,H,Sq]
        m_new = jnp.maximum(m_run, m_cur)
        # a query row that has seen NO visible key keeps m_new == NEG_INF;
        # exp(s - m_new) would then be 1 everywhere and the row would output
        # mean(V) over masked keys — force p to 0 so the row yields zeros
        p = jnp.where(m_new[..., None] <= NEG_INF / 2, 0.0,
                      jnp.exp(s - m_new[..., None]))
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32)

        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        mask_cur = lax.ppermute(mask_cur, axis_name, perm)
        return acc, m_new, l_new, k_cur, v_cur, mask_cur

    acc0 = jnp.zeros((b, h, s_local, d), jnp.float32)
    m0 = jnp.full((b, h, s_local), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_local), jnp.float32)
    acc, m, l, _, _, _ = lax.fori_loop(
        0, n, body, (acc0, m0, l0, k, v, kv_mask))
    out = acc / jnp.maximum(l, 1e-30)[..., None]         # [B,H,Sq,D]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def make_ring_attention(mesh, axis_name="sequence", causal=False):
    """Convenience: a callable over GLOBAL [B,S,H,D] arrays sharded on the
    sequence axis. Delegates to ops.attention.sequence_parallel_attention —
    the production wrapper — so the batch ALSO shards over the mesh's
    data/fsdp axes (a local spec of P(None, seq) would all-gather the batch
    onto every data row and redundantly compute it there)."""
    from easynlp_tpu.ops.attention import sequence_parallel_attention

    def fn(q, k, v, kv_mask=None):
        return sequence_parallel_attention(q, k, v, kv_mask=kv_mask,
                                           causal=causal, mesh=mesh,
                                           axis_name=axis_name)

    return fn
