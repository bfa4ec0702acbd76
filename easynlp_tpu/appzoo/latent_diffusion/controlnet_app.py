"""ControlNet finetune wrapper: train the conditioning clone through the
standard Trainer while the base diffusion model stays frozen.

Capability parity+: the reference's webui extension only *infers* with
pre-trained `Chinese_Controlnet` checkpoints
(diffusion/chinese_sd_webui/ChineseSD/scripts/chinese_sd_ext.py:143-199);
this wrapper also provides the training recipe that produces such
checkpoints (Zhang et al. 2023): encoder clone initialised from the UNet,
zero convs at zero, base frozen via the Trainer's `trainable_mask` /
optax.multi_transform seam (same seam as LoRA, core/lora_app.py).

The conditioning hint is derived in-graph from the training image by
`edge_hint` (thresholded Sobel — the zero-egress stand-in for cv2.Canny),
so the existing latent_diffusion TSV/dataset pipeline is reused unchanged.
Checkpoints carry:
  - flax_params.msgpack          the (unchanged) base — predict-compatible
  - flax_params_control.msgpack  the trained ControlNet alone
"""

import jax
import jax.numpy as jnp

from easynlp_tpu.modelzoo.models.latent_diffusion.controlnet import (
    ControlNetModel,
    edge_hint,
)
from easynlp_tpu.utils.logger import logger


class ControlNetApplication:
    """Wraps a LatentDiffusion app; quacks like an Application for the
    Trainer. Params split {"base": frozen LDM, "control": trainable clone}."""

    def __init__(self, inner, control_params=None, hint_type="edge",
                 seed=0):
        self.inner = inner
        self.module = inner.module
        self.config = inner.config
        self.label_mapping = inner.label_mapping
        self.model_input_keys = inner.model_input_keys
        self.hint_type = hint_type
        self.cnet = ControlNetModel(config=inner.config,
                                    dtype=inner.module.dtype)
        control = control_params if control_params is not None else \
            inner.init_controlnet_params(seed=seed)
        self.params = {"base": inner.params, "control": control}
        self.param_logical_axes = {
            "base": inner.param_logical_axes,
            "control": jax.tree.map(lambda _: None, control),
        }
        self.trainable_mask = {
            "base": jax.tree.map(lambda _: False, inner.params),
            "control": jax.tree.map(lambda _: True, control),
        }
        self.eval_target = self  # trainer evaluates the COMPOSITE app
        n = sum(x.size for x in jax.tree.leaves(control))
        logger.info("ControlNet finetune: %d trainable params, hint=%s",
                    n, hint_type)

    def _hint(self, pixel_values):
        if self.hint_type == "edge":
            return edge_hint(pixel_values)
        raise ValueError("unknown hint_type %r" % self.hint_type)

    # -- training -------------------------------------------------------------
    def make_train_loss(self):
        """LDM eps-loss with ControlNet residuals injected; only `control`
        receives optimizer updates (base masked frozen)."""
        module, config, schedule = (self.inner.module, self.inner.config,
                                    self.inner.schedule)
        cnet, hint_fn = self.cnet, self._hint

        def loss_fn(params, batch, rng):
            base, control = params["base"], params["control"]
            r_t, r_noise, r_vae, r_drop = jax.random.split(rng, 4)
            context = module.apply(
                {"params": base}, batch["input_ids"],
                batch.get("attention_mask"), deterministic=False,
                rngs={"dropout": r_drop}, method=module.encode_text)
            latents = module.apply({"params": base}, batch["pixel_values"],
                                   rng=r_vae, method=module.encode_image)
            b = latents.shape[0]
            t = jax.random.randint(r_t, (b,), 0, config.num_train_timesteps)
            noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
            noisy = schedule.q_sample(latents, t, noise)
            # precomputed conditioning map (e.g. depth, controlnet_hint_column)
            # wins over the in-graph edge derivation
            hint = batch["hint_values"] if "hint_values" in batch \
                else hint_fn(batch["pixel_values"])
            downs, mid = cnet.apply({"params": control}, noisy, hint, t,
                                    context)
            pred = module.apply({"params": base}, noisy, t, context,
                                deterministic=False, rngs={"dropout": r_drop},
                                method=module.predict_noise,
                                control=(downs, mid))
            if config.loss_type == "l1":
                loss = jnp.mean(jnp.abs(pred - noise))
            else:
                loss = jnp.mean((pred - noise) ** 2)
            return loss, {"loss": loss}

        return loss_fn

    # -- inference ------------------------------------------------------------
    def forward(self, batch, params=None):
        p = params or self.params
        return self.inner.forward(batch, params=p["base"])

    def __getattr__(self, name):
        return getattr(self.inner, name)

    # -- Trainer checkpoint hooks --------------------------------------------
    def export_params(self, params):
        """Main artifact stays the untouched base, so every existing
        predictor/pipeline loads the checkpoint unmodified."""
        return params["base"]

    def extra_save_artifacts(self, params):
        return {"flax_params_control.msgpack": params["control"]}

    def restore_params(self, ckpt_dir, current_params):
        from easynlp_tpu.modelzoo.modeling_utils import load_params
        base = load_params(ckpt_dir, target=current_params["base"],
                           name="flax_params.msgpack")
        control = load_params(ckpt_dir, target=current_params["control"],
                              name="flax_params_control.msgpack")
        return {"base": base, "control": control}

    def sync_trained_params(self, params):
        self.params = params
        self.inner.params = params["base"]

    # evaluated AS the composite app (trainer eval_target seam): scoring the
    # frozen inner base alone would log a constant loss all through training
    def per_sample_eval_loss(self, params, batch, rng):
        """Deterministic per-sample eps-loss WITH the control residual —
        the quantity actually being optimized (LDMEvaluator contract)."""
        module, config, schedule = (self.inner.module, self.inner.config,
                                    self.inner.schedule)
        base, control = params["base"], params["control"]
        r_t, r_noise = jax.random.split(rng)
        context = module.apply({"params": base}, batch["input_ids"],
                               batch.get("attention_mask"),
                               method=module.encode_text)
        latents = module.apply({"params": base}, batch["pixel_values"],
                               method=module.encode_image)
        b = latents.shape[0]
        t = jax.random.randint(r_t, (b,), 0, config.num_train_timesteps)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        noisy = schedule.q_sample(latents, t, noise)
        hint = batch["hint_values"] if "hint_values" in batch \
            else self._hint(batch["pixel_values"])
        downs, mid = self.cnet.apply({"params": control}, noisy, hint, t,
                                     context)
        pred = module.apply({"params": base}, noisy, t, context,
                            method=module.predict_noise,
                            control=(downs, mid))
        err = jnp.abs(pred - noise) if config.loss_type == "l1" \
            else (pred - noise) ** 2
        return jnp.mean(err.reshape(b, -1), axis=-1)

    @classmethod
    def load_control(cls, inner, ckpt_dir, hint_type="edge"):
        """Attach a trained ControlNet from a checkpoint to a freshly-loaded
        base app (conditioned-sampling-from-checkpoint path)."""
        from easynlp_tpu.modelzoo.modeling_utils import load_params
        template = inner.init_controlnet_params()
        control = load_params(ckpt_dir, target=template,
                              name="flax_params_control.msgpack")
        return cls(inner, control_params=control, hint_type=hint_type)

    def sample(self, input_ids, attention_mask, negative_input_ids, hint,
               rng, num_steps=50, guidance_scale=7.5, method="ddim",
               control_scale=1.0):
        sampler = self.inner.make_controlnet_sampler(
            num_steps=num_steps, guidance_scale=guidance_scale,
            method=method, control_scale=control_scale)
        return sampler(self.params["base"], self.params["control"],
                       input_ids, attention_mask, negative_input_ids, hint,
                       rng)
