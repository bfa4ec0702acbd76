"""Loss library (capability parity: reference easynlp/utils/losses.py).

All functions are pure jnp, shape-static, and safe under jit/pjit. Cross
entropies accept an ignore_index and normalise by valid-token count. The large-
vocab softmax-CE has a fused Pallas path in ops/fused_ce.py; this module is the
semantic reference implementation.
"""

import jax
import jax.numpy as jnp


def mse_loss(logits, targets):
    return jnp.mean((logits.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2)


def per_sample_cross_entropy(logits, labels):
    """Unreduced CE: logits [B, V], labels [B] → nll [B] (reference
    cross_entropy(..., reduction='none') used by MetaKD weighting)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - gold


def cross_entropy(logits, labels, ignore_index=-100, label_smoothing=0.0):
    """Mean CE over valid positions. logits [..., V], labels [...] int."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = logz - gold
    if label_smoothing > 0.0:
        v = logits.shape[-1]
        smooth = logz - jnp.mean(logits, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth \
            - label_smoothing * jnp.log(jnp.float32(v)) * 0.0
        del v
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def soft_cross_entropy(logits, soft_targets):
    """CE against a probability distribution (reference losses.py:134-137)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-soft_targets * logp, axis=-1))


def vanilla_kd_loss(student_logits, teacher_logits, labels, temperature=1.0,
                    alpha=0.5, ignore_index=-100):
    """Vanilla KD: alpha*CE(student, labels) + (1-alpha)*T^2*KL(p_t || p_s)
    with temperature-scaled softmaxes (reference losses.py:52-73)."""
    t = jnp.float32(temperature)
    s = student_logits.astype(jnp.float32) / t
    te = teacher_logits.astype(jnp.float32) / t
    log_ps = jax.nn.log_softmax(s, axis=-1)
    pt = jax.nn.softmax(te, axis=-1)
    kd = jnp.mean(jnp.sum(pt * (jax.nn.log_softmax(te, axis=-1) - log_ps), axis=-1))
    ce = cross_entropy(student_logits, labels, ignore_index=ignore_index)
    return alpha * ce + (1.0 - alpha) * kd * t * t


def multi_label_sigmoid_ce(logits, targets):
    """BCE-with-logits over multi-hot targets (reference losses.py:76-94)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def hinge_loss(pos_scores, neg_scores, margin=0.3):
    """Pairwise hinge for two-tower match (reference text_match/model.py)."""
    return jnp.mean(jnp.maximum(0.0, margin - pos_scores + neg_scores))


def cosine_embedding_loss(emb_a, emb_b, labels, margin=0.0):
    """labels in {1, -1} (reference losses.py:119-133)."""
    a = emb_a.astype(jnp.float32)
    b = emb_b.astype(jnp.float32)
    cos = jnp.sum(a * b, -1) / (
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8)
    pos = 1.0 - cos
    neg = jnp.maximum(0.0, cos - margin)
    return jnp.mean(jnp.where(labels > 0, pos, neg))


def circle_loss(sim_matrix, labels, margin=0.45, gamma=32.0):
    """Circle loss over an in-batch similarity matrix; labels[i,j]=1 when pair
    (i,j) is positive (two-tower text match variant)."""
    sim = sim_matrix.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    op, on = 1.0 + margin, -margin
    dp, dn = 1.0 - margin, margin
    ap = jnp.maximum(op - sim, 0.0)
    an = jnp.maximum(sim - on, 0.0)
    logit_p = -ap * (sim - dp) * gamma
    logit_n = an * (sim - dn) * gamma
    # logsumexp over positives and negatives separately, masked
    neg_inf = jnp.float32(-1e30)
    lp = jax.nn.logsumexp(jnp.where(labels > 0, logit_p, neg_inf), axis=-1)
    ln = jax.nn.logsumexp(jnp.where(labels > 0, neg_inf, logit_n), axis=-1)
    return jnp.mean(jax.nn.softplus(lp + ln))


def clip_contrastive_loss(logits_per_text):
    """Symmetric in-batch contrastive loss (reference clip/model.py:40-162).
    logits_per_text: [B, B] similarity * temperature."""
    n = logits_per_text.shape[0]
    labels = jnp.arange(n)
    li = cross_entropy(logits_per_text, labels)
    lt = cross_entropy(logits_per_text.T, labels)
    return 0.5 * (li + lt)
