"""Optimizer-trajectory parity vs torch.

A faithful torch re-implementation of the reference BertAdam (reference
easynlp/core/optimizers.py:217-375 — per-step warmup_linear multiplier, NO
bias correction, decoupled weight decay added to the update, grad clipping)
is run for N steps against easynlp_tpu's `bert_adam` on the same model, same
data, same init. Loss curves and final weights must agree — this certifies
the full update semantics (schedule + decay + clip), not just the forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from easynlp_tpu.core.optimizers import bert_adam, warmup_linear_schedule

LR = 0.05
T_TOTAL = 24
WARMUP = 0.25
WD = 0.01
STEPS = 24


def _data(seed=0, n=64, d=8, classes=4):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    w_true = rng.randn(d, classes).astype(np.float32)
    y = (x @ w_true).argmax(-1).astype(np.int64)
    return x, y


def _init_mlp(seed=0, d=8, h=16, classes=4):
    rng = np.random.RandomState(seed + 100)
    return {
        "l1": {"kernel": (rng.randn(d, h) * 0.3).astype(np.float32),
               "bias": np.zeros(h, np.float32)},
        "l2": {"kernel": (rng.randn(h, classes) * 0.3).astype(np.float32),
               "bias": np.zeros(classes, np.float32)},
    }


def _jax_loss(params, x, y, scale=1.0):
    h = jnp.maximum(x @ params["l1"]["kernel"] + params["l1"]["bias"], 0.0)
    logits = h @ params["l2"]["kernel"] + params["l2"]["bias"]
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(logp[jnp.arange(y.shape[0]), y]) * scale


def _torch_forward(pt, x, y, scale=1.0):
    h = torch.relu(x @ pt["l1.kernel"] + pt["l1.bias"])
    logits = h @ pt["l2.kernel"] + pt["l2.bias"]
    return torch.nn.functional.cross_entropy(logits, y) * scale


class TorchRefBertAdam:
    """The reference BertAdam step body, transcribed
    (reference core/optimizers.py:309-370): per-parameter grad clip,
    m/v without bias correction, update = m/(sqrt(v)+e) + wd*p,
    p -= lr*schedule(step)*update. Parameter groups mirror the reference
    trainer's no-decay split (reference core/optimizers.py:490-498)."""

    def __init__(self, named_params, lr, warmup, t_total, b1=0.9, b2=0.999,
                 e=1e-6, weight_decay=0.01, max_grad_norm=1.0):
        self.named_params = list(named_params)
        self.lr, self.warmup, self.t_total = lr, warmup, t_total
        self.b1, self.b2, self.e = b1, b2, e
        self.weight_decay = weight_decay
        self.max_grad_norm = max_grad_norm
        self.state = {n: {"step": 0,
                          "m": torch.zeros_like(p),
                          "v": torch.zeros_like(p)}
                      for n, p in self.named_params}

    def _schedule(self, step):
        # WarmupLinearSchedule.get_lr_ (reference optimizers.py:62-71,
        # 150-160): progress = step/t_total
        progress = float(step) / self.t_total
        if progress < self.warmup:
            return progress / self.warmup
        return max((progress - 1.0) / (self.warmup - 1.0), 0.0)

    def step(self):
        for n, p in self.named_params:
            grad = p.grad.data
            st = self.state[n]
            if self.max_grad_norm > 0:
                torch.nn.utils.clip_grad_norm_([p], self.max_grad_norm)
            st["m"].mul_(self.b1).add_(grad, alpha=1 - self.b1)
            st["v"].mul_(self.b2).addcmul_(grad, grad, value=1 - self.b2)
            update = st["m"] / (st["v"].sqrt() + self.e)
            wd = 0.0 if "bias" in n else self.weight_decay
            if wd > 0:
                update = update + wd * p.data
            lr_t = self.lr * self._schedule(st["step"])
            p.data.add_(-lr_t * update)
            st["step"] += 1


def _run_torch(init, x, y, steps, scale=1.0, max_grad_norm=-1.0):
    pt = {"%s.%s" % (k, kk): torch.tensor(v, requires_grad=True)
          for k, sub in init.items() for kk, v in sub.items()}
    opt = TorchRefBertAdam(pt.items(), lr=LR, warmup=WARMUP, t_total=T_TOTAL,
                           weight_decay=WD, max_grad_norm=max_grad_norm)
    xt = torch.tensor(x)
    yt = torch.tensor(y)
    losses = []
    for _ in range(steps):
        for p in pt.values():
            if p.grad is not None:
                p.grad = None
        loss = _torch_forward(pt, xt, yt, scale)
        loss.backward()
        losses.append(float(loss))
        opt.step()
    return losses, {k: v.detach().numpy() for k, v in pt.items()}


def _run_jax(init, x, y, steps, scale=1.0, max_grad_norm=-1.0):
    params = jax.tree.map(jnp.asarray, dict(init))
    sched = warmup_linear_schedule(LR, WARMUP, T_TOTAL)
    tx = bert_adam(sched, weight_decay=WD, max_grad_norm=max_grad_norm)
    state = tx.init(params)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(_jax_loss)(params, xj, yj, scale)
        updates, state = tx.update(grads, state, params)
        import optax
        return loss, optax.apply_updates(params, updates), state

    losses = []
    for _ in range(steps):
        loss, params, state = step(params, state)
        losses.append(float(loss))
    flat = {"%s.%s" % (k, kk): np.asarray(v)
            for k, sub in params.items() for kk, v in sub.items()}
    return losses, flat


def test_bertadam_trajectory_matches_torch_reference():
    """No-clip trajectory: warmup_linear schedule + decoupled weight decay +
    no-bias-correction moments must track the reference step-for-step."""
    x, y = _data()
    init = _init_mlp()
    tl, tw = _run_torch(init, x, y, STEPS)
    jl, jw = _run_jax(init, x, y, STEPS)
    np.testing.assert_allclose(jl, tl, rtol=2e-4)
    for k in tw:
        np.testing.assert_allclose(jw[k], tw[k], atol=5e-5,
                                   err_msg="weight drift at %s" % k)
    # training actually progressed (not trivially matching at init)
    assert jl[-1] < jl[0] * 0.9


def test_bertadam_clip_semantics_single_param():
    """Clip-binding trajectory on a single-parameter model, where the
    reference's per-parameter clip and the repo's global-norm clip coincide —
    certifies the clip threshold/normalisation math. Loss is scaled x200 so
    the clip is active every step."""
    x, y = _data(seed=3)
    init = {"l1": {"kernel": _init_mlp(seed=3)["l1"]["kernel"]}}

    def jx_loss(params, xj, yj, scale):
        logits = (xj @ params["l1"]["kernel"])[:, :4]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(yj.shape[0]), yj]) * scale

    def th_loss(pt, xt, yt, scale):
        logits = (xt @ pt["l1.kernel"])[:, :4]
        return torch.nn.functional.cross_entropy(logits, yt) * scale

    # monkey-patch the forwards for this test's single-layer model
    global _jax_loss, _torch_forward
    saved = (_jax_loss, _torch_forward)
    _jax_loss, _torch_forward = jx_loss, th_loss
    try:
        tl, tw = _run_torch(init, x, y, 12, scale=200.0, max_grad_norm=1.0)
        jl, jw = _run_jax(init, x, y, 12, scale=200.0, max_grad_norm=1.0)
    finally:
        _jax_loss, _torch_forward = saved
    np.testing.assert_allclose(jl, tl, rtol=5e-4)
    np.testing.assert_allclose(jw["l1.kernel"], tw["l1.kernel"], atol=1e-4)
