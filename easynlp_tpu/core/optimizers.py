"""Optimizers & LR schedules.

Capability parity: reference easynlp/core/optimizers.py — `BertAdam` (:217,
warmup schedule fused into the optimizer, no bias correction, weight decay
added to the update before lr), `AdamW` (:381), warmup schedules (:90-190),
and `get_optimizer` (:472) computing t_total and no-decay param groups.

TPU-native: everything is an optax GradientTransformation so optimizer state
is a pytree that pjit can shard over the dp axis (ZeRO-equivalent,
--shard_optimizer_states), and the whole update runs inside the jitted train
step.
"""

import math

import jax
import jax.numpy as jnp
import optax

NO_DECAY_SUBSTRINGS = ("bias", "LayerNorm", "layer_norm", "_ln", "ln_")


# -- schedules (fraction x = step/t_total, warmup w) --------------------------

def constant_schedule(lr, **_):
    return lambda step: lr


def warmup_constant_schedule(lr, warmup, t_total):
    def f(step):
        x = step / max(t_total, 1)
        return lr * jnp.minimum(x / max(warmup, 1e-8), 1.0)
    return f


def warmup_linear_schedule(lr, warmup, t_total):
    def f(step):
        x = step / max(t_total, 1)
        warm = x / max(warmup, 1e-8)
        decay = jnp.maximum((1.0 - x) / max(1.0 - warmup, 1e-8), 0.0)
        return lr * jnp.where(x < warmup, warm, decay)
    return f


def warmup_cosine_schedule(lr, warmup, t_total, cycles=0.5):
    def f(step):
        x = step / max(t_total, 1)
        warm = x / max(warmup, 1e-8)
        prog = (x - warmup) / max(1.0 - warmup, 1e-8)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * cycles * 2.0 * prog))
        return lr * jnp.where(x < warmup, warm, jnp.maximum(cos, 0.0))
    return f


def warmup_cosine_hard_restarts_schedule(lr, warmup, t_total, cycles=1.0):
    def f(step):
        x = step / max(t_total, 1)
        warm = x / max(warmup, 1e-8)
        prog = (x - warmup) / max(1.0 - warmup, 1e-8)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * ((cycles * prog) % 1.0)))
        return lr * jnp.where(x < warmup, warm, jnp.maximum(cos, 0.0))
    return f


SCHEDULES = {
    "none": constant_schedule,
    "constant": constant_schedule,
    "warmup_constant": warmup_constant_schedule,
    "warmup_linear": warmup_linear_schedule,
    "warmup_cosine": warmup_cosine_schedule,
    "warmup_cosine_with_hard_restarts": warmup_cosine_hard_restarts_schedule,
}


def _decay_mask(params):
    """True where weight decay applies (reference get_optimizer no-decay
    groups: bias and LayerNorm params excluded)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decays(path):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        return not any(sub in joined for sub in NO_DECAY_SUBSTRINGS)

    mask_flat = [decays(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def bert_adam(schedule_fn, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01,
              max_grad_norm=1.0, decay_mask_fn=_decay_mask):
    """Reference BertAdam semantics: global clip → m,v (no bias correction) →
    update = m/(√v+eps) + wd·θ → θ -= lr_t · update."""

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        if max_grad_norm and max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g,
                         state["v"], grads)
        lr_t = schedule_fn(state["step"])
        mask = decay_mask_fn(params)
        updates = jax.tree.map(
            lambda mm, vv, p, use_wd: -lr_t * (
                mm / (jnp.sqrt(vv) + eps)
                + (weight_decay * p if weight_decay else 0.0) * use_wd),
            m, v, params, jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), mask))
        return updates, {"step": state["step"] + 1, "m": m, "v": v}

    return optax.GradientTransformation(init, update)


def adamw(schedule_fn, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
          max_grad_norm=1.0):
    """Decoupled AdamW with bias correction (reference optimizers.py:381)."""
    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask=_decay_mask))
    chain.append(optax.scale_by_learning_rate(schedule_fn))
    return optax.chain(*chain)


def get_optimizer(optimizer_type="AdamW", learning_rate=5e-5,
                  warmup_proportion=0.1, lr_scheduler="warmup_linear",
                  epoch_num=3.0, steps_per_epoch=100,
                  gradient_accumulation_steps=1, weight_decay=0.01,
                  max_grad_norm=1.0, b1=0.9, b2=0.999, eps=1e-8):
    """Build (optax transformation, schedule_fn, t_total) — reference
    get_optimizer t_total = ceil(steps_per_epoch/grad_accum)·epochs."""
    t_total = int(math.ceil(steps_per_epoch / gradient_accumulation_steps)
                  * epoch_num)
    schedule_fn = SCHEDULES[lr_scheduler](
        learning_rate, warmup=warmup_proportion, t_total=t_total) \
        if lr_scheduler not in ("none", "constant") \
        else constant_schedule(learning_rate)
    if optimizer_type == "BertAdam":
        tx = bert_adam(schedule_fn, b1=b1, b2=b2, eps=1e-6,
                       weight_decay=weight_decay, max_grad_norm=max_grad_norm)
    elif optimizer_type in ("AdamW", "Adam"):
        wd = weight_decay if optimizer_type == "AdamW" else 0.0
        tx = adamw(schedule_fn, b1=b1, b2=b2, eps=eps, weight_decay=wd,
                   max_grad_norm=max_grad_norm)
    elif optimizer_type == "SGD":
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                         optax.sgd(schedule_fn))
    elif optimizer_type == "Lion":
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                         optax.lion(schedule_fn, weight_decay=weight_decay))
    elif optimizer_type == "Adafactor":
        tx = optax.adafactor(schedule_fn)
    else:
        raise ValueError("unknown optimizer %r" % optimizer_type)
    return tx, schedule_fn, t_total
