"""Mixture-of-Experts FFN (Switch-Transformer style).

Capability parity: the reference ships GPT-MoE only as scripts delegating to
the closed-source `rapidformer` package (reference
examples/rapidformer/gpt_moe/*, SURVEY.md §2.7 'Expert parallel: ❌
in-package'); this is the in-package TPU-native implementation.

TPU shape: top-k routing with capacity buckets, dispatch/combine as einsums
(one-hot masks — no gather/scatter, everything MXU-friendly), expert kernels
stacked [E, D, F] and annotated with the `expert` logical axis so GSPMD
shards them over the mesh's expert axis and inserts the all-to-alls the
hand-written MoE frameworks do manually. Load-balancing aux loss per the
Switch paper (Fedus et al. 2021)."""

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class SwitchMoE(nn.Module):
    """Drop-in MLP replacement: [.., S, D] -> ([.., S, D], aux_loss)."""

    d_model: int
    d_ff: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    router_jitter: float = 0.01
    activation: Callable = nn.gelu
    kernel_init: Any = nn.initializers.normal(0.02)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        e, d, f = self.num_experts, self.d_model, self.d_ff
        orig_shape = x.shape
        x = x.reshape(-1, d)
        n = x.shape[0]
        capacity = max(self.top_k, int(
            math.ceil(self.top_k * n / e * self.capacity_factor)))

        # ---- router (fp32 for stable softmax; Switch paper §2.4) ----------
        router_kernel = self.param(
            "router", nn.with_logical_partitioning(self.kernel_init,
                                                   ("embed", None)),
            (d, e), jnp.float32)
        logits = x.astype(jnp.float32) @ router_kernel
        if not deterministic and self.router_jitter > 0:
            rng = self.make_rng("dropout")
            logits = logits * jax.random.uniform(
                rng, logits.shape, jnp.float32,
                1.0 - self.router_jitter, 1.0 + self.router_jitter)
        probs = jax.nn.softmax(logits, axis=-1)                  # [N, E]

        # ---- top-k dispatch with capacity ---------------------------------
        dispatch = jnp.zeros((n, e), jnp.float32)
        gates = jnp.zeros((n, e), jnp.float32)
        remaining = probs
        for _ in range(self.top_k):
            idx = jnp.argmax(remaining, axis=-1)                 # [N]
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)
            gates = gates + onehot * probs
            dispatch = dispatch + onehot
            remaining = remaining * (1.0 - onehot)
        if self.top_k > 1:
            # renormalize the combine gates over the SELECTED experts
            # (GShard/T5X top-k convention) so the FFN branch keeps unit
            # scale vs the dense MLP / top-1 config it drops in for
            denom = jnp.sum(gates, axis=-1, keepdims=True)
            gates = gates / jnp.maximum(denom, 1e-9)
        # raw routing assignment BEFORE capacity dropping — the aux loss
        # must see the true load so overloaded experts keep a gradient
        assigned = dispatch
        # position of each token within its expert's capacity bucket
        position = jnp.cumsum(dispatch, axis=0) * dispatch - 1.0  # [N, E]
        keep = (position >= 0) & (position < capacity)
        dispatch = dispatch * keep                                # drop overflow
        gates = gates * keep
        pos_oh = jax.nn.one_hot(position.astype(jnp.int32), capacity,
                                dtype=jnp.float32)                # [N, E, C]
        dispatch_nec = dispatch[..., None] * pos_oh               # [N, E, C]
        combine_nec = gates[..., None] * pos_oh

        # ---- expert FFN (stacked kernels, expert-sharded) ------------------
        wi = self.param("wi", nn.with_logical_partitioning(
            self.kernel_init, ("expert", "embed", "mlp")),
            (e, d, f), jnp.float32)
        wo = self.param("wo", nn.with_logical_partitioning(
            self.kernel_init, ("expert", "mlp", "embed")),
            (e, f, d), jnp.float32)
        bi = self.param("bi", nn.with_logical_partitioning(
            nn.initializers.zeros, ("expert", "mlp")), (e, f), jnp.float32)
        bo = self.param("bo", nn.with_logical_partitioning(
            nn.initializers.zeros, ("expert", "embed")), (e, d), jnp.float32)

        xin = jnp.einsum("nec,nd->ecd", dispatch_nec.astype(self.dtype),
                         x.astype(self.dtype))                    # [E, C, D]
        h = self.activation(
            jnp.einsum("ecd,edf->ecf", xin, wi.astype(self.dtype))
            + bi[:, None].astype(self.dtype))
        xout = jnp.einsum("ecf,efd->ecd", h, wo.astype(self.dtype)) \
            + bo[:, None].astype(self.dtype)                      # [E, C, D]
        out = jnp.einsum("nec,ecd->nd", combine_nec.astype(self.dtype), xout)

        # ---- Switch load-balancing loss: E * sum_e f_e * p_e ---------------
        # f_e from the PRE-capacity assignment (Switch paper eq. 4): the
        # post-drop mask clips an overloaded expert's fraction to ~1/E,
        # which would saturate the balancing gradient exactly when it is
        # needed; /top_k keeps sum(f_e) == 1 for top-k routing
        f_e = jnp.mean(assigned, axis=0) / self.top_k             # fraction
        p_e = jnp.mean(probs, axis=0)                             # router mass
        aux = jnp.float32(e) * jnp.sum(f_e * p_e)

        return out.reshape(orig_shape), aux
