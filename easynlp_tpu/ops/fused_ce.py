"""Fused large-vocab softmax cross-entropy.

Two TPU-native replacements for the reference's LM-head CE:

1. `chunked_softmax_ce(hidden, embedding, labels)` — never materialises the
   [N, V] logits in HBM: a lax.scan over vocab chunks computes the online
   logsumexp + gold logit forward, and the custom VJP recomputes each chunk's
   probabilities to accumulate dhidden / dembedding. Memory drops from
   O(N·V) to O(N·chunk) at the cost of one extra matmul pass — the same
   trade the flash-attention kernel makes.

2. `vocab_parallel_cross_entropy(logits, labels, axis_name)` — the Megatron
   mpu.vocab_parallel_cross_entropy equivalent (reference
   mg_utils/mg_seq2seq/finetune.py:46): logits sharded over the 'tensor' mesh
   axis on the vocab dim; three psums (max, sumexp, gold) produce the exact
   global CE with no all-gather of the vocab dimension.
"""

import functools

import jax
import jax.numpy as jnp


# -----------------------------------------------------------------------------
# chunked CE over a tied embedding
# -----------------------------------------------------------------------------

def _chunk_stats(hidden, emb_chunk, labels, chunk_start):
    """logits for one vocab chunk + the gold-label logit contribution.
    The row max is computed by the caller AFTER masking padded vocab
    columns, so it is not returned here."""
    logits = jnp.dot(hidden, emb_chunk.T,
                     preferred_element_type=jnp.float32)  # [N, C]
    in_chunk = (labels >= chunk_start) & (labels < chunk_start + emb_chunk.shape[0])
    local = jnp.clip(labels - chunk_start, 0, emb_chunk.shape[0] - 1)
    gold = jnp.take_along_axis(logits, local[:, None], axis=-1)[:, 0]
    gold = jnp.where(in_chunk, gold, 0.0)
    return logits, gold, in_chunk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def chunked_softmax_ce(hidden, embedding, labels, chunk_size=8192,
                       ignore_index=-100):
    loss, _ = _ce_fwd_stats(hidden, embedding, labels, chunk_size,
                            ignore_index)
    return loss


def _ce_fwd_stats(hidden, embedding, labels, chunk_size, ignore_index):
    n, e = hidden.shape
    v = embedding.shape[0]
    chunk_size = min(chunk_size, v)
    pad_v = (-v) % chunk_size
    emb = jnp.pad(embedding, ((0, pad_v), (0, 0))) if pad_v else embedding
    n_chunks = emb.shape[0] // chunk_size
    hidden32 = hidden.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)

    def body(carry, chunk_idx):
        m_run, s_run, gold_run = carry
        start = chunk_idx * chunk_size
        emb_chunk = jax.lax.dynamic_slice(emb, (start, 0), (chunk_size, e))
        logits, gold, in_chunk = _chunk_stats(
            hidden32, emb_chunk.astype(jnp.float32), safe_labels, start)
        # mask padded vocab rows
        col = start + jnp.arange(chunk_size)
        logits = jnp.where((col < v)[None, :], logits, -jnp.inf)
        m = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_run, m)
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        gold_run = gold_run + gold
        return (m_new, s_run, gold_run), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m, s, gold), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    lse = m + jnp.log(s)
    nll = jnp.where(valid, lse - gold, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(nll) / denom
    return loss, (lse, denom)


def _ce_vjp_fwd(hidden, embedding, labels, chunk_size, ignore_index):
    loss, (lse, denom) = _ce_fwd_stats(hidden, embedding, labels, chunk_size,
                                       ignore_index)
    return loss, (hidden, embedding, labels, lse, denom)


def _ce_vjp_bwd(chunk_size, ignore_index, res, g):
    hidden, embedding, labels, lse, denom = res
    n, e = hidden.shape
    v = embedding.shape[0]
    cs = min(chunk_size, v)
    pad_v = (-v) % cs
    emb = jnp.pad(embedding, ((0, pad_v), (0, 0))) if pad_v else embedding
    n_chunks = emb.shape[0] // cs
    hidden32 = hidden.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    scale = (g / denom).astype(jnp.float32)

    def body(carry, chunk_idx):
        dh = carry
        start = chunk_idx * cs
        emb_chunk = jax.lax.dynamic_slice(emb, (start, 0),
                                          (cs, e)).astype(jnp.float32)
        logits = jnp.dot(hidden32, emb_chunk.T,
                         preferred_element_type=jnp.float32)
        col = start + jnp.arange(cs)
        p = jnp.exp(logits - lse[:, None])
        p = jnp.where((col < v)[None, :], p, 0.0)
        onehot = (safe_labels[:, None] == col[None, :]) & valid[:, None]
        dlogits = (p - onehot.astype(jnp.float32)) * valid[:, None] * scale
        dh = dh + jnp.dot(dlogits, emb_chunk,
                          preferred_element_type=jnp.float32)
        demb_chunk = jnp.dot(dlogits.T, hidden32,
                             preferred_element_type=jnp.float32)
        return dh, demb_chunk

    dh0 = jnp.zeros((n, e), jnp.float32)
    dh, demb_chunks = jax.lax.scan(body, dh0, jnp.arange(n_chunks))
    demb = demb_chunks.reshape(n_chunks * cs, e)[:v]
    return dh.astype(hidden.dtype), demb.astype(embedding.dtype), None


chunked_softmax_ce.defvjp(_ce_vjp_fwd, _ce_vjp_bwd)


# -----------------------------------------------------------------------------
# vocab-parallel CE (tensor-parallel LM head)
# -----------------------------------------------------------------------------

def vocab_parallel_cross_entropy(local_logits, labels, axis_name="tensor",
                                 ignore_index=-100):
    """CE over logits whose vocab dim is sharded across `axis_name`.

    Call inside shard_map/pjit with local_logits [N, V/tp]; labels are GLOBAL
    vocab ids, replicated. Exact Megatron semantics via 3 collectives."""
    tp = jax.lax.axis_size(axis_name)
    shard = jax.lax.axis_index(axis_name)
    v_local = local_logits.shape[-1]
    vocab_start = shard * v_local
    logits = local_logits.astype(jnp.float32)

    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    local_ids = jnp.clip(safe_labels - vocab_start, 0, v_local - 1)
    in_shard = (safe_labels >= vocab_start) & (safe_labels < vocab_start + v_local)

    m = jax.lax.pmax(jnp.max(logits, axis=-1), axis_name)
    sumexp = jax.lax.psum(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1),
                          axis_name)
    gold_local = jnp.take_along_axis(logits, local_ids[:, None], -1)[:, 0]
    gold = jax.lax.psum(jnp.where(in_shard, gold_local, 0.0), axis_name)
    nll = (m + jnp.log(sumexp)) - gold
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom
