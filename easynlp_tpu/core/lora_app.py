"""LoRA application wrapper: adapter-only finetuning of ANY app through the
standard Trainer.

Capability parity: reference diffusion/diffusers_api LoRA finetune
(/root/reference/diffusion/README.md:1-30). TPU shape: the wrapper's params
are {"base": frozen weights, "lora": adapters}; the train loss merges
functionally (modelzoo/lora.py) inside the jitted step, the Trainer masks
the base out of the optimizer via `trainable_mask`, and checkpoints carry
  - flax_params.msgpack        merged weights (predict/pipeline-compatible)
  - flax_params_lora.msgpack   the adapters alone (composable/sharable)
  - flax_params_base.msgpack   the frozen base (exact resume)
"""

import jax

from easynlp_tpu.modelzoo.lora import (DEFAULT_TARGETS, count_lora_params,
                                       lora_apply, lora_init, lora_merge,
                                       match_report)
from easynlp_tpu.utils.logger import logger


class LoRAApplication:
    """Wraps a built app; quacks like an Application for the Trainer."""

    def __init__(self, inner, rank=4, alpha=None, targets=DEFAULT_TARGETS,
                 seed=0, lora_params=None):
        self.inner = inner
        self.module = inner.module
        self.config = inner.config
        self.label_mapping = inner.label_mapping
        self.model_input_keys = inner.model_input_keys
        self.rank = int(rank)
        self.alpha = float(alpha if alpha is not None else rank)
        self.scale = self.alpha / self.rank
        self.targets = targets
        lora = lora_params if lora_params is not None else \
            lora_init(inner.params, rank=self.rank, targets=targets,
                      seed=seed)
        self.params = {"base": inner.params, "lora": lora}
        self.param_logical_axes = {
            "base": inner.param_logical_axes,
            "lora": jax.tree.map(lambda _: None, lora),
        }
        # base frozen, adapters trainable (Trainer wraps the optimizer in
        # optax.multi_transform over this mask)
        self.trainable_mask = {
            "base": jax.tree.map(lambda _: False, inner.params),
            "lora": jax.tree.map(lambda _: True, lora),
        }
        n = count_lora_params(lora)
        logger.info("LoRA r=%d alpha=%.1f: %d adapter params over %d kernels",
                    self.rank, self.alpha, n,
                    len(match_report(inner.params, targets)))

    # -- training -------------------------------------------------------------
    def make_train_loss(self):
        scale = self.scale
        inner = self.inner
        if hasattr(inner, "make_train_loss"):
            inner_loss = inner.make_train_loss()

            def loss_fn(params, batch, rng):
                merged = lora_apply(params["base"], params["lora"], scale)
                return inner_loss(merged, batch, rng)
        else:
            from easynlp_tpu.core.trainer import default_forward_loss
            base_loss = default_forward_loss(
                inner.module, inner.model_input_keys, inner.loss_fn)

            def loss_fn(params, batch, rng):
                merged = lora_apply(params["base"], params["lora"], scale)
                return base_loss(merged, batch, rng)

        return loss_fn

    # -- inference ------------------------------------------------------------
    def merged_params(self, params=None):
        p = params or self.params
        return lora_merge(p["base"], p["lora"], self.scale)

    def forward(self, batch, params=None):
        return self.inner.forward(batch, params=self.merged_params(params))

    def __getattr__(self, name):
        # delegate everything else (evaluator hooks, sample(), ...) to the
        # inner app — note inner sees its own (stale base) params, so
        # after_train syncs merged weights back (Trainer hook below)
        return getattr(self.inner, name)

    # -- Trainer checkpoint hooks --------------------------------------------
    def export_params(self, params):
        """Main artifact = merged weights, so predictors/pipelines load the
        checkpoint with zero LoRA awareness."""
        return self.merged_params(params)

    def extra_save_artifacts(self, params):
        return {"flax_params_lora.msgpack": params["lora"],
                "flax_params_base.msgpack": params["base"]}

    def restore_params(self, ckpt_dir, current_params):
        from easynlp_tpu.modelzoo.modeling_utils import load_params
        base = load_params(ckpt_dir, target=current_params["base"],
                           name="flax_params_base.msgpack")
        lora = load_params(ckpt_dir, target=current_params["lora"],
                           name="flax_params_lora.msgpack")
        return {"base": base, "lora": lora}

    def sync_trained_params(self, params):
        """after_train: the inner app serves with merged weights."""
        self.params = params
        self.inner.params = self.merged_params(params)

    @classmethod
    def load_adapter(cls, inner, ckpt_dir, rank=4, alpha=None,
                     targets=DEFAULT_TARGETS):
        """Attach a trained adapter from a checkpoint to a freshly-loaded
        base app (sampling-from-LoRA-checkpoint path)."""
        from easynlp_tpu.modelzoo.modeling_utils import load_params
        template = lora_init(inner.params, rank=rank, targets=targets)
        lora = load_params(ckpt_dir, target=template,
                           name="flax_params_lora.msgpack")
        return cls(inner, rank=rank, alpha=alpha, targets=targets,
                   lora_params=lora)
