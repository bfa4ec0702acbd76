"""BertAdam trajectory parity for the sequence-generation (seq2seq LM
finetune) loss geometry — the last app-geometry family without trajectory
evidence (round-4 VERDICT item 5).

CLUE/generation data is unreachable (zero egress), so quality evidence
extends through app-level trajectory parity: the same torch transcription
of the reference optimizer (reference easynlp/core/optimizers.py:217-375,
see test_optimizer_trajectory.TorchRefBertAdam) is run against
easynlp_tpu's `bert_adam` under the seq2seq geometry the reference's
sequence_generation app trains (teacher-forced shifted-target LM
cross-entropy with pad ignore over an encoder-decoder coupling, reference
appzoo/sequence_generation/model.py; label-smoothed variant per the GLM
path, reference appzoo/sequence_generation/mg_seq2seq/finetune.py:33-55).
The model is deliberately tiny but keeps the geometry's distinguishing
pieces: a token-EMBEDDING table trained by scatter-add grads (absent from
the classification/MRC/labeling suites), an encoder context coupled into
every decoder position (cross-attention's gradient path), and the
shift/ignore/smoothing loss shape. Loss curves and final weights must
agree step-for-step in float64 (see test_trajectory_mrc_labeling's note
on why doubles: float32 BertAdam accumulation drifts ~1e-3 chaotically
over 20 steps with matching losses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from easynlp_tpu.core.optimizers import bert_adam, warmup_linear_schedule
from tests.test_optimizer_trajectory import T_TOTAL, WARMUP, WD, \
    TorchRefBertAdam

B, S_SRC, S_TGT = 6, 10, 9
D, H, V = 8, 16, 24
PAD = 0
STEPS = 20
# the classification suites run LR=0.05; this geometry (two relu stacks,
# an embedding table, and a vocab softmax) flips relu boundaries at that
# rate and chaotically amplifies float64 accumulation-order noise to ~5e-7
# by step 10 — LR=0.01 keeps the 20-step comparison about the MATH
# (losses to 1e-7, weights to 1e-6) while still training loss down >10x
LR = 0.01


def _init(seed):
    rng = np.random.RandomState(seed + 7)
    return {
        "emb": {"table": (rng.randn(V, D) * 0.3).astype(np.float64)},
        "enc": {"kernel": (rng.randn(D, H) * 0.3).astype(np.float64),
                "bias": np.zeros(H, np.float64)},
        "ctx": {"kernel": (rng.randn(H, H) * 0.3).astype(np.float64)},
        "dec": {"kernel": (rng.randn(D, H) * 0.3).astype(np.float64),
                "bias": np.zeros(H, np.float64)},
        "lm": {"kernel": (rng.randn(H, V) * 0.3).astype(np.float64),
               "bias": np.zeros(V, np.float64)},
    }


def _data(seed):
    """Source ids/mask + right-padded target ids (teacher forcing shifts
    them internally). PAD=0 never appears as a real token."""
    rng = np.random.RandomState(seed)
    src = rng.randint(1, V, (B, S_SRC))
    src_len = rng.randint(4, S_SRC + 1, B)
    src_mask = (np.arange(S_SRC)[None, :] < src_len[:, None])
    src[~src_mask] = PAD
    tgt = rng.randint(1, V, (B, S_TGT))
    tgt_len = rng.randint(3, S_TGT + 1, B)
    tgt[np.arange(S_TGT)[None, :] >= tgt_len[:, None]] = PAD
    return src, src_mask.astype(np.float64), tgt


def _jax_logits(params, src, src_mask, tgt_in):
    emb_s = params["emb"]["table"][src]                      # [B, Ss, D]
    h_src = jnp.maximum(
        jnp.einsum("bsd,dh->bsh", emb_s, params["enc"]["kernel"])
        + params["enc"]["bias"], 0.0)
    denom = jnp.sum(src_mask, axis=1, keepdims=True)
    ctx = jnp.einsum("bsh,bs->bh", h_src, src_mask) / denom  # [B, H]
    ctx = ctx @ params["ctx"]["kernel"]                      # [B, H]
    emb_t = params["emb"]["table"][tgt_in]                   # [B, St, D]
    h = jnp.maximum(
        jnp.einsum("btd,dh->bth", emb_t, params["dec"]["kernel"])
        + params["dec"]["bias"] + ctx[:, None, :], 0.0)
    return jnp.einsum("bth,hv->btv", h, params["lm"]["kernel"]) \
        + params["lm"]["bias"]                               # [B, St, V]


def _torch_logits(pt, src, src_mask, tgt_in):
    emb_s = pt["emb.table"][src]
    h_src = torch.relu(torch.einsum("bsd,dh->bsh", emb_s, pt["enc.kernel"])
                       + pt["enc.bias"])
    denom = src_mask.sum(dim=1, keepdim=True)
    ctx = torch.einsum("bsh,bs->bh", h_src, src_mask) / denom
    ctx = ctx @ pt["ctx.kernel"]
    emb_t = pt["emb.table"][tgt_in]
    h = torch.relu(torch.einsum("btd,dh->bth", emb_t, pt["dec.kernel"])
                   + pt["dec.bias"] + ctx[:, None, :])
    return torch.einsum("bth,hv->btv", h, pt["lm.kernel"]) + pt["lm.bias"]


def _run_pair(init, jax_loss, torch_loss, steps=STEPS):
    """Same init through the repo optimizer and the torch transcription
    (mirrors test_trajectory_mrc_labeling._run_pair)."""
    pt = {"%s.%s" % (k, kk): torch.tensor(v, requires_grad=True)
          for k, sub in init.items() for kk, v in sub.items()}
    opt = TorchRefBertAdam(pt.items(), lr=LR, warmup=WARMUP, t_total=T_TOTAL,
                           weight_decay=WD, max_grad_norm=-1.0)
    t_losses = []
    for _ in range(steps):
        for p in pt.values():
            p.grad = None
        loss = torch_loss(pt)
        loss.backward()
        t_losses.append(float(loss))
        opt.step()
    t_w = {k: v.detach().numpy() for k, v in pt.items()}

    with jax.enable_x64(True):
        params = jax.tree.map(jnp.asarray, dict(init))
        tx = bert_adam(warmup_linear_schedule(LR, WARMUP, T_TOTAL),
                       weight_decay=WD, max_grad_norm=-1.0)
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            loss, grads = jax.value_and_grad(jax_loss)(params)
            updates, state = tx.update(grads, state, params)
            import optax
            return loss, optax.apply_updates(params, updates), state

        j_losses = []
        for _ in range(steps):
            loss, params, state = step(params, state)
            j_losses.append(float(loss))
        j_w = {"%s.%s" % (k, kk): np.asarray(v)
               for k, sub in params.items() for kk, v in sub.items()}
    return j_losses, t_losses, j_w, t_w


def _shift(tgt):
    """Teacher forcing: decoder reads tgt[:, :-1], predicts tgt[:, 1:]."""
    return tgt[:, :-1], tgt[:, 1:]


def test_seq2seq_lm_trajectory_matches_torch():
    """Shifted-target LM CE with pad ignore, averaged over non-pad targets
    (the sequence_generation finetune objective)."""
    src, src_mask, tgt = _data(31)
    tgt_in, tgt_out = _shift(tgt)
    init = _init(31)

    def jax_loss(params):
        logits = _jax_logits(params, jnp.asarray(src), jnp.asarray(src_mask),
                             jnp.asarray(tgt_in))
        lbl = jnp.asarray(tgt_out)
        keep = lbl != PAD
        logp = jax.nn.log_softmax(logits)
        gold = jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
        return -(gold * keep).sum() / keep.sum()

    st, sm = torch.tensor(src), torch.tensor(src_mask)
    ti = torch.tensor(tgt_in)
    to = torch.tensor(tgt_out.reshape(-1))

    def torch_loss(pt):
        logits = _torch_logits(pt, st, sm, ti).reshape(-1, V)
        return torch.nn.functional.cross_entropy(logits, to,
                                                 ignore_index=PAD)

    jl, tl, jw, tw = _run_pair(init, jax_loss, torch_loss)
    np.testing.assert_allclose(jl, tl, rtol=1e-7, atol=2e-9)
    for k in tw:
        np.testing.assert_allclose(jw[k], tw[k], atol=1e-6,
                                   err_msg="weight drift at %s" % k)
    assert jl[-1] < jl[0] * 0.9   # the LM objective actually trains


def test_seq2seq_label_smoothed_trajectory_matches_torch():
    """Label-smoothed variant (the GLM seq2seq path's loss,
    reference mg_seq2seq/finetune.py:43-55; epsilon distributed uniformly
    over ALL classes, torch cross_entropy(label_smoothing=eps) semantics)."""
    eps = 0.1
    src, src_mask, tgt = _data(41)
    tgt_in, tgt_out = _shift(tgt)
    init = _init(41)

    def jax_loss(params):
        logits = _jax_logits(params, jnp.asarray(src), jnp.asarray(src_mask),
                             jnp.asarray(tgt_in))
        lbl = jnp.asarray(tgt_out)
        keep = lbl != PAD
        logp = jax.nn.log_softmax(logits)
        gold = jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
        uniform = jnp.mean(logp, axis=-1)
        per_tok = -((1.0 - eps) * gold + eps * uniform)
        return (per_tok * keep).sum() / keep.sum()

    st, sm = torch.tensor(src), torch.tensor(src_mask)
    ti = torch.tensor(tgt_in)
    to = torch.tensor(tgt_out.reshape(-1))

    def torch_loss(pt):
        logits = _torch_logits(pt, st, sm, ti).reshape(-1, V)
        return torch.nn.functional.cross_entropy(
            logits, to, ignore_index=PAD, label_smoothing=eps)

    jl, tl, jw, tw = _run_pair(init, jax_loss, torch_loss)
    np.testing.assert_allclose(jl, tl, rtol=1e-7, atol=2e-9)
    for k in tw:
        np.testing.assert_allclose(jw[k], tw[k], atol=1e-6,
                                   err_msg="weight drift at %s" % k)
    assert jl[-1] < jl[0] * 0.9
