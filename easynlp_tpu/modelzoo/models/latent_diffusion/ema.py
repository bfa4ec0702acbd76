"""Functional EMA of model parameters.

Capability parity: reference easynlp/modelzoo/models/latent_diffusion/ema.py
(LitEma — per-parameter shadow buffers with the warmup-corrected decay
min(decay, (1+n)/(10+n)), store/restore swap). TPU shape: the shadow is just
a params-pytree carried next to the optimizer state and updated inside the
jitted train step — no buffer registration, no host sync."""

import jax
import jax.numpy as jnp


def ema_init(params):
    """Shadow copy (fp32) + update counter. Must be a real copy — the live
    params are donated by the train step, so aliasing them would leave the
    shadow pointing at deleted buffers."""
    shadow = jax.tree.map(
        lambda x: jnp.array(x, dtype=jnp.float32, copy=True), params)
    return {"shadow": shadow, "num_updates": jnp.zeros((), jnp.int32)}


def ema_update(state, params, decay=0.9999, use_num_updates=True):
    """One EMA step (reference LitEma.forward :25-44)."""
    n = state["num_updates"] + 1
    if use_num_updates:
        eff = jnp.minimum(jnp.float32(decay),
                          (1.0 + n.astype(jnp.float32))
                          / (10.0 + n.astype(jnp.float32)))
    else:
        eff = jnp.float32(decay)
    one_minus = 1.0 - eff
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(jnp.float32)),
        state["shadow"], params)
    return {"shadow": shadow, "num_updates": n}


def ema_params(state, like=None):
    """The averaged weights, cast back to the dtype layout of `like`
    (reference LitEma.copy_to)."""
    if like is None:
        return state["shadow"]
    return jax.tree.map(lambda s, p: s.astype(p.dtype), state["shadow"], like)
