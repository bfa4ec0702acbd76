"""BertAdam trajectory parity for MRC (span head) and sequence-labeling
(per-token CE with ignore_index) loss shapes.

Round-3 VERDICT item 5: CLUE data is unreachable (zero egress), so quality
evidence extends through app-level trajectory parity instead — the same
torch transcription of the reference optimizer
(reference easynlp/core/optimizers.py:217-375, see
test_optimizer_trajectory.TorchRefBertAdam) is run against easynlp_tpu's
`bert_adam` under the two remaining head/loss geometries the reference's
CLUE recipes use (MRC start/end CE with clamped positions,
reference appzoo/machine_reading_comprehension/model.py; token-level CE with
-100 ignore, reference appzoo/sequence_labeling/model.py). Loss curves and
final weights must agree step-for-step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from easynlp_tpu.core.optimizers import bert_adam, warmup_linear_schedule
from tests.test_optimizer_trajectory import LR, T_TOTAL, WARMUP, WD, \
    TorchRefBertAdam

B, S, D, H = 8, 12, 8, 16
STEPS = 20
IGNORE = -100


# float64 everywhere: single-step grads agree to ~4e-8 in float32, but 20
# BertAdam steps amplify that noise chaotically (~1e-3 weight drift with
# matching losses). Doubles make the parity assert tight (1e-9) and the
# comparison about the MATH, not accumulation order. Residual ~3e-8
# weight deltas remain (schedule constants in float32), so the asserts sit
# at 1e-6/1e-7 — ~30x above the measured noise floor, ~1000x below the
# float32 chaotic drift this guards against.
def _init(seed, classes):
    rng = np.random.RandomState(seed + 7)
    return {
        "enc": {"kernel": (rng.randn(D, H) * 0.3).astype(np.float64),
                "bias": np.zeros(H, np.float64)},
        "head": {"kernel": (rng.randn(H, classes) * 0.3).astype(np.float64),
                 "bias": np.zeros(classes, np.float64)},
    }


def _features(seed):
    rng = np.random.RandomState(seed)
    return rng.randn(B, S, D)


def _jax_logits(params, x):
    h = jnp.maximum(jnp.einsum("bsd,dh->bsh", x, params["enc"]["kernel"])
                    + params["enc"]["bias"], 0.0)
    return jnp.einsum("bsh,hc->bsc", h, params["head"]["kernel"]) \
        + params["head"]["bias"]


def _torch_logits(pt, x):
    h = torch.relu(torch.einsum("bsd,dh->bsh", x, pt["enc.kernel"])
                   + pt["enc.bias"])
    return torch.einsum("bsh,hc->bsc", h, pt["head.kernel"]) + pt["head.bias"]


def _run_pair(init, jax_loss, torch_loss, steps=STEPS):
    """Run the SAME init through the repo optimizer and the torch
    transcription; return (jax_losses, torch_losses, jax_w, torch_w)."""
    # --- torch side
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

    # --- jax side (x64 scoped to this test; global config untouched)
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


def test_mrc_span_head_trajectory_matches_torch():
    """Start/end span CE (positions clamped into [0, S-1] like the reference
    MRC head) — the 2-logit-per-position geometry."""
    x = _features(11)
    rng = np.random.RandomState(12)
    start = rng.randint(-2, S + 2, B)   # some out-of-range -> clamped
    end = rng.randint(-2, S + 2, B)
    init = _init(11, classes=2)

    s_cl = np.clip(start, 0, S - 1)
    e_cl = np.clip(end, 0, S - 1)

    def jax_loss(params):
        logits = _jax_logits(params, jnp.asarray(x))      # [B, S, 2]
        st, en = logits[..., 0], logits[..., 1]
        lse_s = jax.nn.log_softmax(st)
        lse_e = jax.nn.log_softmax(en)
        ls = -jnp.mean(lse_s[jnp.arange(B), jnp.asarray(s_cl)])
        le = -jnp.mean(lse_e[jnp.arange(B), jnp.asarray(e_cl)])
        return (ls + le) / 2.0

    xt = torch.tensor(x)
    st_t = torch.tensor(s_cl)
    en_t = torch.tensor(e_cl)

    def torch_loss(pt):
        logits = _torch_logits(pt, xt)
        st, en = logits[..., 0], logits[..., 1]
        ls = torch.nn.functional.cross_entropy(st, st_t)
        le = torch.nn.functional.cross_entropy(en, en_t)
        return (ls + le) / 2.0

    jl, tl, jw, tw = _run_pair(init, jax_loss, torch_loss)
    np.testing.assert_allclose(jl, tl, rtol=1e-7, atol=2e-9)
    for k in tw:
        np.testing.assert_allclose(jw[k], tw[k], atol=1e-6,
                                   err_msg="weight drift at %s" % k)
    assert jl[-1] < jl[0] * 0.9   # the span objective actually trains


def test_sequence_labeling_trajectory_matches_torch():
    """Token-level CE with -100 ignore (subword continuation positions are
    masked exactly like the reference labeling head)."""
    n_tags = 5
    x = _features(21)
    rng = np.random.RandomState(22)
    labels = rng.randint(0, n_tags, (B, S))
    labels[rng.rand(B, S) < 0.3] = IGNORE   # ignored subword positions
    init = _init(21, classes=n_tags)

    def jax_loss(params):
        logits = _jax_logits(params, jnp.asarray(x))      # [B, S, C]
        lbl = jnp.asarray(labels)
        keep = lbl != IGNORE
        logp = jax.nn.log_softmax(logits)
        gold = jnp.take_along_axis(
            logp, jnp.maximum(lbl, 0)[..., None], axis=-1)[..., 0]
        return -(gold * keep).sum() / keep.sum()

    xt = torch.tensor(x)
    lt = torch.tensor(labels.reshape(-1))

    def torch_loss(pt):
        logits = _torch_logits(pt, xt).reshape(-1, n_tags)
        return torch.nn.functional.cross_entropy(logits, lt,
                                                 ignore_index=IGNORE)

    jl, tl, jw, tw = _run_pair(init, jax_loss, torch_loss)
    np.testing.assert_allclose(jl, tl, rtol=1e-7, atol=2e-9)
    for k in tw:
        np.testing.assert_allclose(jw[k], tw[k], atol=1e-6,
                                   err_msg="weight drift at %s" % k)
    assert jl[-1] < jl[0] * 0.9
