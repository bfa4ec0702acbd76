"""Latent-diffusion evaluator: fixed-seed eps-prediction loss over the
validation set (the reference evaluates LDM by validation loss; a fixed rng
per batch index makes the metric deterministic across runs)."""

import jax
import jax.numpy as jnp

from easynlp_tpu.core.evaluator import Evaluator
from easynlp_tpu.utils.logger import logger


class LDMEvaluator(Evaluator):
    def __init__(self, valid_dataset, **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(valid_dataset, **kwargs)
        self._jit_loss_cache = {}

    def evaluate(self, app):
        module, config, schedule = app.module, app.config, app.schedule
        # per-app cache (one evaluator may score different apps); apps with
        # composite trained state define their own per-sample loss (e.g.
        # ControlNet — the plain path below would score the frozen base)
        self._jit_loss = self._jit_loss_cache.get(id(app))
        if self._jit_loss is None and \
                "per_sample_eval_loss" in type(app).__dict__:
            self._jit_loss = jax.jit(
                lambda params, batch, rng: app.per_sample_eval_loss(
                    params, batch, rng))
            self._jit_loss_cache[id(app)] = self._jit_loss
        if self._jit_loss is None:
            def batch_loss(params, batch, rng):
                r_t, r_noise = jax.random.split(rng)
                context = module.apply(
                    {"params": params}, batch["input_ids"],
                    batch.get("attention_mask"), method=module.encode_text)
                latents = module.apply({"params": params},
                                       batch["pixel_values"],
                                       method=module.encode_image)
                b = latents.shape[0]
                t = jax.random.randint(r_t, (b,), 0,
                                       config.num_train_timesteps)
                noise = jax.random.normal(r_noise, latents.shape,
                                          jnp.float32)
                noisy = schedule.q_sample(latents, t, noise)
                pred = module.apply({"params": params}, noisy, t, context,
                                    method=module.predict_noise)
                err = (pred - noise) ** 2 if config.loss_type != "l1" \
                    else jnp.abs(pred - noise)
                return jnp.mean(err.reshape(b, -1), axis=-1)  # [B]

            self._jit_loss = jax.jit(batch_loss)
            self._jit_loss_cache[id(app)] = self._jit_loss

        total, n = 0.0, 0
        for i, batch in enumerate(self.valid_loader):
            valid = batch.pop("_valid").astype(bool)
            per = jax.device_get(self._jit_loss(
                app.params, batch, jax.random.PRNGKey(i)))
            total += float(per[valid].sum())
            n += int(valid.sum())
        eval_loss = total / max(n, 1)
        logger.info("LDM eval loss: %.6f", eval_loss)
        return [("eval_loss", -eval_loss)]
