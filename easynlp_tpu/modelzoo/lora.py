"""LoRA: low-rank adaptation as a functional params transform.

Capability parity: reference diffusion/diffusers_api LoRA finetune for
PAI-Diffusion checkpoints (reference /root/reference/diffusion/README.md:1-30
— `train_text_to_image_lora.py` injects LoRACompatibleLinear into UNet
attention). TPU re-design: instead of swapping module classes, adapters live
in a parallel params tree and are *merged functionally* before module.apply —
merged = W + (alpha/rank) * A @ B inside the jitted step, which XLA fuses
into the surrounding graph. Works unchanged for ANY model family (UNet,
BERT, GPT-2, CLIP towers) because it keys on param paths, not module types.

Training: only the adapter tree is optimized (the Trainer masks the base
via `trainable_mask`); the base is stop_gradient'ed so the backward pass
never materialises base-weight gradients.
"""

import re

import jax
import jax.numpy as jnp

# default targets: attention projections anywhere in the tree — "attn"
# covers this repo's UNet (attn1_qkv / attn2_q / attn2_kv / attn*_out),
# query/key/value/attention_out the BERT-family towers, c_attn/c_proj GPT-2,
# to_* diffusers-style names (2-D kernels only, so convs never match)
DEFAULT_TARGETS = ("attn", "to_q", "to_k", "to_v", "to_out", "query", "key",
                   "value", "attention_out", "c_attn", "c_proj")


def _path_str(path):
    return "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                    for k in path)


def _match(path_s, leaf, targets):
    if getattr(leaf, "ndim", 0) != 2:
        return False
    return any(t in path_s for t in targets)


def lora_init(params, rank=4, targets=DEFAULT_TARGETS, seed=0, dtype=None):
    """Adapter tree parallel to `params`: matched 2-D kernels get
    {"a": [in, r] (kaiming-ish init), "b": [r, out] (zeros — the adapter
    starts as identity)}; everything else maps to an empty dict so the tree
    structure stays alignable."""
    rng = jax.random.PRNGKey(seed)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(1, len(flat)))

    def make(i, path, leaf):
        path_s = _path_str(path)
        if not _match(path_s, leaf, targets):
            return None
        d_in, d_out = leaf.shape
        dt = dtype or leaf.dtype
        a = jax.random.normal(keys[i], (d_in, rank), jnp.float32) / rank
        return {"a": a.astype(dt), "b": jnp.zeros((rank, d_out), dt)}

    leaves = [make(i, p, l) for i, (p, l) in enumerate(flat)]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def lora_apply(params, lora, scale, stop_base_gradient=True):
    """Merged params: W' = W + scale * A@B on adapted leaves. With
    stop_base_gradient the base tree contributes no backward paths — only
    the adapters train."""
    def merge(p, ad):
        base = jax.lax.stop_gradient(p) if stop_base_gradient else p
        if ad is None:
            return base
        return (base.astype(jnp.float32)
                + scale * (ad["a"].astype(jnp.float32)
                           @ ad["b"].astype(jnp.float32))).astype(p.dtype)

    return jax.tree.map(merge, params, lora,
                        is_leaf=lambda x: x is None or (
                            isinstance(x, dict) and set(x) == {"a", "b"}))


def lora_merge(params, lora, scale):
    """Deployment merge (no gradient plumbing) — write-out form."""
    return lora_apply(params, lora, scale, stop_base_gradient=False)


def lora_mask(lora, value=True):
    """Boolean tree over the adapter leaves (for optimizer masking)."""
    return jax.tree.map(lambda _: value, lora)


def count_lora_params(lora):
    return sum(x.size for x in jax.tree.leaves(lora))


def match_report(params, targets=DEFAULT_TARGETS):
    """Which kernels would be adapted — for logging/debugging."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [_path_str(p) for p, l in flat if _match(_path_str(p), l, targets)]


def parse_targets(spec):
    """'to_q,to_k' or regex-ish comma list from user_defined_parameters."""
    if not spec:
        return DEFAULT_TARGETS
    return tuple(s.strip() for s in str(spec).split(",") if s.strip())
