"""Latent diffusion application.

Capability parity: reference easynlp/appzoo/latent_diffusion/model.py —
training forward = VAE-encode → random timestep → q_sample noising → UNet
noise prediction, loss = l1/l2 vs noise (:127-182); predict = DDIM sampling
with classifier-free guidance + VAE decode (:144-168). The ESRGAN
super-resolution stage and StableDiffusion wrapper (:184-287) are follow-ups.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.models.bert import BertConfig, BertModel
from easynlp_tpu.modelzoo.models.latent_diffusion.autoencoder import (
    VAEDecoder,
    VAEEncoder,
)
from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
    DiffusionSchedule,
    ddim_sample,
)
from easynlp_tpu.modelzoo.models.latent_diffusion.unet import UNetModel


class LDMConfig(PretrainedConfig):
    model_type = "latent_diffusion"

    def __init__(self, image_size=256, latent_channels=4, model_channels=128,
                 channel_mult=(1, 2, 4), num_res_blocks=2,
                 attention_levels=(1, 2), num_heads=8, context_dim=768,
                 vae_channels=64, vae_channel_mult=(1, 2, 4),
                 vae_num_res_blocks=1, num_train_timesteps=1000,
                 scale_factor=0.18215, text_config=None, loss_type="l2",
                 **kwargs):
        self.image_size = image_size
        self.latent_channels = latent_channels
        self.model_channels = model_channels
        self.channel_mult = tuple(channel_mult)
        self.num_res_blocks = num_res_blocks
        self.attention_levels = tuple(attention_levels)
        self.num_heads = num_heads
        self.context_dim = context_dim
        self.in_channels = latent_channels
        self.out_channels = latent_channels
        self.vae_channels = vae_channels
        self.vae_channel_mult = tuple(vae_channel_mult)
        self.vae_num_res_blocks = vae_num_res_blocks
        self.num_train_timesteps = num_train_timesteps
        self.scale_factor = scale_factor
        self.loss_type = loss_type
        self.text_config_dict = text_config or {}
        super().__init__(**kwargs)

    @property
    def text_config(self):
        return BertConfig(**self.text_config_dict)


class LDMModule(nn.Module):
    """Holds all towers; exposes functional sub-methods the app jits."""

    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.unet = UNetModel(config=c, dtype=self.dtype)
        self.vae_encoder = VAEEncoder(config=c, dtype=self.dtype)
        self.vae_decoder = VAEDecoder(config=c, dtype=self.dtype)
        self.text_encoder = BertModel(c.text_config, dtype=self.dtype,
                                      add_pooling_layer=False)

    def encode_text(self, input_ids, attention_mask=None, deterministic=True):
        out = self.text_encoder(input_ids, attention_mask=attention_mask,
                                deterministic=deterministic)
        return out["last_hidden_state"]

    def encode_image(self, pixels, rng=None):
        mean, logvar = self.vae_encoder(pixels)
        if rng is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(rng, mean.shape)
        return mean * self.config.scale_factor

    def decode_latents(self, latents):
        return self.vae_decoder(latents / self.config.scale_factor)

    def predict_noise(self, noisy_latents, timesteps, context,
                      deterministic=True, share_self=None, cross_frame=False,
                      control=None):
        return self.unet(noisy_latents, timesteps, context=context,
                         deterministic=deterministic, share_self=share_self,
                         cross_frame=cross_frame, control=control)

    def __call__(self, pixel_values, input_ids, attention_mask=None,
                 timesteps=None, deterministic=True):
        """Full-graph forward touching every tower (used for init & export)."""
        context = self.encode_text(input_ids, attention_mask, deterministic)
        latents = self.encode_image(pixel_values)
        if timesteps is None:
            timesteps = jnp.zeros((latents.shape[0],), jnp.int32)
        pred = self.predict_noise(latents, timesteps, context, deterministic)
        decoded = self.decode_latents(latents)
        return {"context": context, "latents": latents, "pred": pred,
                "decoded": decoded}


class LatentDiffusion(Application):
    model_input_keys = ("pixel_values", "input_ids", "attention_mask")

    def __init__(self, module, params, config, label_mapping=None):
        super().__init__(module, params, config, label_mapping)
        self.schedule = DiffusionSchedule(config.num_train_timesteps)

    def sample_inputs(self):
        c = self.config
        return {"pixel_values": jnp.ones((1, c.image_size, c.image_size, 3),
                                         jnp.float32),
                "input_ids": jnp.ones((1, 8), jnp.int32)}

    @classmethod
    def init_params(cls, module, config, seed=0):
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            pixel_values=jnp.ones((1, config.image_size, config.image_size, 3),
                                  jnp.float32),
            input_ids=jnp.ones((1, 8), jnp.int32),
            timesteps=jnp.zeros((1,), jnp.int32),
            deterministic=True)
        return nn.unbox(variables["params"])

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return LDMConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        return LDMModule(config=config, dtype=dtype)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        """CompVis/PAI-Diffusion .ckpt → LDMModule params (reference
        appzoo/latent_diffusion/model.py:144-183 load_model_from_config)."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.conversion import (
            convert_stable_diffusion)
        return convert_stable_diffusion(state_dict, config)

    # -- training -------------------------------------------------------------
    def make_train_loss(self):
        """Returns loss_fn(params, batch, rng) for the Trainer: VAE-encode →
        q_sample → UNet eps-prediction → l1/l2."""
        module, config, schedule = self.module, self.config, self.schedule

        def loss_fn(params, batch, rng):
            r_t, r_noise, r_vae, r_drop = jax.random.split(rng, 4)
            context = module.apply(
                {"params": params}, batch["input_ids"],
                batch.get("attention_mask"), deterministic=False,
                rngs={"dropout": r_drop}, method=module.encode_text)
            latents = module.apply({"params": params}, batch["pixel_values"],
                                   rng=r_vae, method=module.encode_image)
            b = latents.shape[0]
            t = jax.random.randint(r_t, (b,), 0, config.num_train_timesteps)
            noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
            noisy = schedule.q_sample(latents, t, noise)
            pred = module.apply({"params": params}, noisy, t, context,
                                deterministic=False, rngs={"dropout": r_drop},
                                method=module.predict_noise)
            if config.loss_type == "l1":
                loss = jnp.mean(jnp.abs(pred - noise))
            else:
                loss = jnp.mean((pred - noise) ** 2)
            return loss, {"loss": loss}

        return loss_fn

    @staticmethod
    def loss_fn(outputs, batch):
        raise NotImplementedError(
            "latent diffusion uses make_train_loss (needs rng/timesteps)")

    # -- sampling -------------------------------------------------------------
    def make_sampler(self, num_steps=50, guidance_scale=7.5, method="ddim",
                     decode=True):
        """Returns sampler(params, input_ids, attention_mask,
        negative_input_ids, rng) → images. Params are an ARGUMENT — jitting a
        closure that captures them would bake gigabytes of weights into the
        compiled program as constants. method: 'ddim' | 'plms' |
        'dpm++' (DPM-Solver++(2M), good at 15-25 steps).
        decode=False returns the final LATENTS instead of VAE-decoded
        images (pair with make_decoder() to split the two phases — e.g.
        batching many samplings before one decode pass, or timing the
        denoise loop separately)."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
            dpm_solver_pp_sample, plms_sample)
        sample_fn = {"ddim": ddim_sample, "plms": plms_sample,
                     "dpm++": dpm_solver_pp_sample}[method]
        module, config, schedule = self.module, self.config, self.schedule

        def sampler(params, input_ids, attention_mask, negative_input_ids,
                    rng):
            shape = self._latent_shape(input_ids.shape[0])
            denoise = self._make_denoise(params, input_ids, attention_mask,
                                         negative_input_ids, guidance_scale)
            latents = sample_fn(denoise, shape, schedule,
                                num_steps=num_steps, rng=rng)
            if not decode:
                return latents
            images = module.apply({"params": params}, latents,
                                  method=module.decode_latents)
            return jnp.clip(images, -1.0, 1.0)

        return sampler

    def make_decoder(self):
        """Returns decoder(params, latents) → images: the VAE-decode half of
        make_sampler(decode=False)."""
        module = self.module

        def decoder(params, latents):
            images = module.apply({"params": params}, latents,
                                  method=module.decode_latents)
            return jnp.clip(images, -1.0, 1.0)

        return decoder

    def _make_denoise(self, params, input_ids, attention_mask,
                      negative_input_ids, guidance_scale):
        """CFG-combined eps predictor shared by every sampler."""
        module = self.module
        context = module.apply({"params": params}, input_ids,
                               attention_mask, method=module.encode_text)
        if guidance_scale > 1.0:
            uncond = module.apply({"params": params}, negative_input_ids,
                                  None, method=module.encode_text)

            def denoise(x, t):
                eps_c = module.apply({"params": params}, x, t, context,
                                     method=module.predict_noise)
                eps_u = module.apply({"params": params}, x, t, uncond,
                                     method=module.predict_noise)
                return eps_u + guidance_scale * (eps_c - eps_u)
        else:
            def denoise(x, t):
                return module.apply({"params": params}, x, t, context,
                                    method=module.predict_noise)
        return denoise

    # -- ControlNet (reference diffusion/chinese_sd_webui: Chinese_Controlnet
    # models conditioning the PAI diffusion UNet) ------------------------------
    def make_controlnet_sampler(self, num_steps=50, guidance_scale=7.5,
                                method="ddim", control_scale=1.0):
        """Returns sampler(params, control_params, input_ids, attention_mask,
        negative_input_ids, hint, rng) → images. `hint` is the pixel-space
        conditioning image [B, H, W, 3] in [0, 1] (e.g. canny/sobel edges);
        control residuals are applied to BOTH CFG branches (webui behavior)
        scaled by control_scale."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.controlnet import (
            ControlNetModel)
        from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
            dpm_solver_pp_sample, plms_sample)
        sample_fn = {"ddim": ddim_sample, "plms": plms_sample,
                     "dpm++": dpm_solver_pp_sample}[method]
        module, schedule = self.module, self.schedule
        cnet = ControlNetModel(config=self.config, dtype=module.dtype)

        def sampler(params, control_params, input_ids, attention_mask,
                    negative_input_ids, hint, rng):
            context = module.apply({"params": params}, input_ids,
                                   attention_mask, method=module.encode_text)
            uncond = (module.apply({"params": params}, negative_input_ids,
                                   None, method=module.encode_text)
                      if guidance_scale > 1.0 else None)

            def eps(x, t, ctx):
                downs, mid = cnet.apply({"params": control_params},
                                        x, hint, t, ctx)
                control = (tuple(control_scale * d for d in downs),
                           control_scale * mid)
                return module.apply({"params": params}, x, t, ctx,
                                    method=module.predict_noise,
                                    control=control)

            def denoise(x, t):
                eps_c = eps(x, t, context)
                if uncond is None:
                    return eps_c
                eps_u = eps(x, t, uncond)
                return eps_u + guidance_scale * (eps_c - eps_u)

            latents = sample_fn(denoise,
                                self._latent_shape(input_ids.shape[0]),
                                schedule, num_steps=num_steps, rng=rng)
            images = module.apply({"params": params}, latents,
                                  method=module.decode_latents)
            return jnp.clip(images, -1.0, 1.0)

        return sampler

    def init_controlnet_params(self, seed=0):
        """Fresh ControlNet: encoder clone initialised FROM the UNet weights
        (the ControlNet recipe — 'trainable copy'), zero convs at zero so
        sampling is bit-identical to the base model until finetuned."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.controlnet import (
            ControlNetModel)
        c = self.config
        hw = c.image_size
        lat = self._latent_shape(1)
        cnet = ControlNetModel(config=c, dtype=self.module.dtype)
        variables = cnet.init(
            jax.random.PRNGKey(seed), jnp.zeros(lat, jnp.float32),
            jnp.zeros((1, hw, hw, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, c.context_dim), jnp.float32))
        p = dict(nn.unbox(variables["params"]))
        unet = self.params["unet"]
        for name in p:
            if name in unet:   # shared encoder submodules copy the UNet
                # real copies, not aliases: base and control live in one
                # donated params tree, and XLA rejects donating the same
                # buffer twice in Execute()
                p[name] = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                       unet[name])
        return p

    def _latent_shape(self, batch):
        hw = self.config.image_size // (
            2 ** (len(self.config.vae_channel_mult) - 1))
        return (batch, hw, hw, self.config.latent_channels)

    # -- FreePromptEditing (reference diffusion/FreePromptEditing, CVPR'24) ---
    def edit(self, source_input_ids, target_input_ids, attention_mask=None,
             num_steps=50, guidance_scale=7.5, share_frac=0.4, rng=None,
             negative_input_ids=None, target_attention_mask=None):
        """Prompt-based editing via self-attention-map sharing (FreeSAP):
        source and target prompts sample from the SAME initial noise, and
        for the first share_frac of the steps the target branch reuses the
        source branch's self-attention maps, inheriting its spatial layout
        while the cross-attention re-paints it with the target prompt.
        Returns images [2B, H, W, 3]: rows [:B] = source, [B:] = edited."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
            ddim_sample)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = jnp.concatenate([source_input_ids, target_input_ids], axis=0)
        # the target prompt gets its OWN padding mask — reusing the source's
        # would silently mask out target tokens past the source length
        tmask = (target_attention_mask if target_attention_mask is not None
                 else attention_mask)
        mask = (jnp.concatenate([attention_mask, tmask], axis=0)
                if attention_mask is not None else None)
        if negative_input_ids is None:
            negative_input_ids = jnp.full_like(
                ids, self.config.text_config.pad_token_id)
        b = source_input_ids.shape[0]
        # timesteps descend; sharing is active while t >= t_cutoff
        import numpy as np
        steps = np.linspace(0, self.config.num_train_timesteps - 1,
                            num_steps, dtype=np.int64)[::-1]
        k = min(int(share_frac * num_steps), num_steps - 1)
        t_cutoff = int(steps[k])
        module, schedule = self.module, self.schedule

        def sampler(params, ids, mask, neg, rng):
            context = module.apply({"params": params}, ids, mask,
                                   method=module.encode_text)
            uncond = module.apply({"params": params}, neg, None,
                                  method=module.encode_text)

            def denoise(x, t):
                share = t[0] > t_cutoff
                eps_c = module.apply({"params": params}, x, t, context,
                                     method=module.predict_noise,
                                     share_self=share)
                if guidance_scale <= 1.0:
                    return eps_c
                eps_u = module.apply({"params": params}, x, t, uncond,
                                     method=module.predict_noise,
                                     share_self=share)
                return eps_u + guidance_scale * (eps_c - eps_u)

            shape = self._latent_shape(2 * b)
            x0 = jax.random.normal(rng, self._latent_shape(b), jnp.float32)
            x0 = jnp.concatenate([x0, x0], axis=0)  # same seed both branches
            latents = ddim_sample(denoise, shape, schedule,
                                  num_steps=num_steps, x_init=x0)
            images = module.apply({"params": params}, latents,
                                  method=module.decode_latents)
            return jnp.clip(images, -1.0, 1.0)

        key = ("edit", num_steps, guidance_scale, t_cutoff, b)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = jax.jit(sampler)
        return fn(self.params, ids, mask, negative_input_ids, rng)

    # -- DiffSynth core: cross-frame video stylization ------------------------
    def stylize_video(self, frames, input_ids, attention_mask=None,
                      strength=0.7, num_steps=50, guidance_scale=7.5,
                      rng=None, negative_input_ids=None,
                      temporal_blend=0.0):
        """Text-guided video stylization with temporal coherence (reference
        diffusion/DiffSynth: img2img over all frames with CrossFrameAttention
        — every frame's self-attention sees every frame, so structure stays
        consistent; pipeline.py VideoStylizingPipeline minus ControlNet and
        the external patch-match smoothers).

        frames [F, H, W, 3] in [-1, 1]; the prompt broadcasts to all frames.
        temporal_blend in [0, 1): optional latent smoother (the reference's
        pluggable smoother seam) — blends each final latent with its
        neighbours' mean before decoding. Returns [F, H, W, 3]."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
            ddim_img2img)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        f = frames.shape[0]
        ids = jnp.broadcast_to(input_ids[0], (f,) + input_ids.shape[1:])
        mask = (jnp.broadcast_to(attention_mask[0],
                                 (f,) + attention_mask.shape[1:])
                if attention_mask is not None else None)
        if negative_input_ids is None:
            negative_input_ids = jnp.full_like(
                ids, self.config.text_config.pad_token_id)
        module, schedule = self.module, self.schedule

        def pipeline(params, frames, ids, mask, neg, rng):
            context = module.apply({"params": params}, ids, mask,
                                   method=module.encode_text)
            uncond = module.apply({"params": params}, neg, None,
                                  method=module.encode_text)

            def denoise(x, t):
                eps_c = module.apply({"params": params}, x, t, context,
                                     method=module.predict_noise,
                                     cross_frame=True)
                if guidance_scale <= 1.0:
                    return eps_c
                eps_u = module.apply({"params": params}, x, t, uncond,
                                     method=module.predict_noise,
                                     cross_frame=True)
                return eps_u + guidance_scale * (eps_c - eps_u)

            latents0 = module.apply({"params": params}, frames,
                                    method=module.encode_image)
            latents = ddim_img2img(denoise, latents0, schedule,
                                   strength=strength, num_steps=num_steps,
                                   rng=rng)
            if temporal_blend > 0.0:
                prev = jnp.concatenate([latents[:1], latents[:-1]], axis=0)
                nxt = jnp.concatenate([latents[1:], latents[-1:]], axis=0)
                latents = ((1.0 - temporal_blend) * latents
                           + temporal_blend * 0.5 * (prev + nxt))
            images = module.apply({"params": params}, latents,
                                  method=module.decode_latents)
            return jnp.clip(images, -1.0, 1.0)

        key = ("stylize", num_steps, guidance_scale, strength,
               temporal_blend)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = jax.jit(pipeline)
        return fn(self.params, frames, ids, mask, negative_input_ids, rng)

    # -- OLSS learned scheduler (reference diffusion/olss_scheduler) ----------
    def fit_olss(self, input_ids, attention_mask=None,
                 negative_input_ids=None, teacher_steps=100, student_steps=10,
                 guidance_scale=7.5, rng=None):
        """Learn an N-step scheduler from a DDIM teacher trajectory on the
        given prompts (reference olss.py SchedulerWrapper.prepare_olss).
        Returns (timesteps, wx, we) for make_olss_sampler / save_olss."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.olss import (
            ddim_collect_path, fit_olss)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if negative_input_ids is None:
            negative_input_ids = jnp.full_like(
                input_ids, self.config.text_config.pad_token_id)
        denoise = self._make_denoise(self.params, input_ids, attention_mask,
                                     negative_input_ids, guidance_scale)
        t_path, x_path, e_path = ddim_collect_path(
            denoise, self._latent_shape(input_ids.shape[0]),
            self.schedule, num_steps=teacher_steps, rng=rng)
        return fit_olss(t_path, x_path, e_path, student_steps)

    def make_olss_sampler(self, olss_params, guidance_scale=7.5):
        """sampler(params, input_ids, attention_mask, negative_input_ids,
        rng) → images, using the learned (timesteps, wx, we)."""
        from easynlp_tpu.modelzoo.models.latent_diffusion.olss import (
            olss_sample)
        timesteps, wx, we = olss_params
        module = self.module

        def sampler(params, input_ids, attention_mask, negative_input_ids,
                    rng):
            denoise = self._make_denoise(params, input_ids, attention_mask,
                                         negative_input_ids, guidance_scale)
            xT = jax.random.normal(
                rng, self._latent_shape(input_ids.shape[0]), jnp.float32)
            latents = olss_sample(denoise, xT, timesteps, wx, we)
            images = module.apply({"params": params}, latents,
                                  method=module.decode_latents)
            return jnp.clip(images, -1.0, 1.0)

        return sampler

    @property
    def _jit_cache(self):
        # jitting a FRESH closure per call would retrace+recompile the full
        # UNet sampler on every invocation; cache per decode config instead
        if not hasattr(self, "_jit_cache_dict"):
            self._jit_cache_dict = {}
        return self._jit_cache_dict

    def sample(self, input_ids, attention_mask=None, num_steps=50,
               guidance_scale=7.5, rng=None, negative_input_ids=None,
               method="ddim"):
        """Text → images [B, H, W, 3] in [-1, 1] (sampler + CFG + VAE
        decode)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if negative_input_ids is None:
            negative_input_ids = jnp.full_like(
                input_ids, self.config.text_config.pad_token_id)
        key = ("sample", num_steps, guidance_scale, method)
        sampler = self._jit_cache.get(key)
        if sampler is None:
            sampler = jax.jit(self.make_sampler(num_steps, guidance_scale,
                                                method=method))
            self._jit_cache[key] = sampler
        return sampler(self.params, input_ids, attention_mask,
                       negative_input_ids, rng)


class StableDiffusionPipeline:
    """Prompt-in, image-out wrapper (reference appzoo/latent_diffusion/
    model.py:184-287 StableDiffusion — tokenize prompt + negative prompt,
    DDIM+CFG sample, optional ESRGAN 4× upscale, base64 PNG out)."""

    def __init__(self, model_dir, num_steps=50, guidance_scale=7.5,
                 image_prefix="", esrgan_params=None, args=None,
                 dtype=jnp.float32):
        from easynlp_tpu.appzoo.api import _tokenizer_for
        self.app = LatentDiffusion.from_pretrained(model_dir, args=args,
                                                   dtype=dtype)
        self.tokenizer = _tokenizer_for(model_dir)
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self.image_prefix = image_prefix
        self._esrgan = None
        if esrgan_params is not None:
            from easynlp_tpu.modelzoo.models.latent_diffusion.esrgan import (
                RRDBNet)
            nb = len(esrgan_params["trunk"]["rdb1"]["conv1"]["kernel"]) \
                if "trunk" in esrgan_params else 23
            self._esrgan = (RRDBNet(nb=nb, dtype=dtype), esrgan_params)

    def upscale(self, images_pm1):
        """4× ESRGAN super-resolution on [-1,1] images (reference :252-266
        runs RRDBNet on the sampler output)."""
        if self._esrgan is None:
            return images_pm1
        module, params = self._esrgan
        x = (jnp.asarray(images_pm1) + 1.0) / 2.0        # RRDBNet is [0,1]
        y = module.apply({"params": params}, x)
        return jnp.clip(y, 0.0, 1.0) * 2.0 - 1.0

    def __call__(self, prompts, negative_prompts=None, seed=0,
                 sequence_length=32, do_upscale=False):
        import numpy as np

        from easynlp_tpu.data.image_utils import encode_image_base64_png
        if isinstance(prompts, str):
            prompts = [prompts]
        enc = self.tokenizer(list(prompts), max_length=sequence_length)
        ids = jnp.asarray(enc["input_ids"], jnp.int32)
        mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        # unconditional context = TOKENIZED empty/negative prompt
        # ([CLS][SEP][PAD]... — reference get_learned_conditioning(['']),
        # appzoo/latent_diffusion/model.py:144-168); a raw all-PAD sequence
        # would shift the CFG branch on converted reference checkpoints
        if not negative_prompts:
            negative_prompts = [""] * len(prompts)
        elif isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts] * len(prompts)
        neg = self.tokenizer(list(negative_prompts),
                             max_length=sequence_length)
        neg_ids = jnp.asarray(neg["input_ids"], jnp.int32)
        images = self.app.sample(
            ids, mask, num_steps=self.num_steps,
            guidance_scale=self.guidance_scale,
            rng=jax.random.PRNGKey(seed), negative_input_ids=neg_ids)
        if do_upscale:
            images = self.upscale(images)
        arr = np.asarray(jax.device_get(images))
        return [{"text": p, "image_base64": encode_image_base64_png(img)}
                for p, img in zip(prompts, arr)]
