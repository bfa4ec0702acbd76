"""Secondary benchmark: SD-1.x-scale latent diffusion sampling throughput
(images/min/chip, 50-step DDIM + CFG + VAE decode at 512x512).
Prints one JSON line (the driver's primary metric stays bench.py)."""

import json
import time

BATCH = 4
STEPS = 50


def main():
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.appzoo.latent_diffusion.model import (LatentDiffusion,
                                                           LDMConfig,
                                                           LDMModule)
    from easynlp_tpu.testing import make_args

    make_args()
    cfg = LDMConfig(
        image_size=512, latent_channels=4, model_channels=320,
        channel_mult=(1, 2, 4, 4), num_res_blocks=2, attention_levels=(1, 2, 3),
        num_heads=8, context_dim=768, vae_channels=128,
        vae_channel_mult=(1, 2, 4, 4), vae_num_res_blocks=2,
        text_config=dict(vocab_size=21128, hidden_size=768,
                         num_hidden_layers=12, num_attention_heads=12,
                         intermediate_size=3072, max_position_embeddings=512))
    module = LDMModule(config=cfg, dtype=jnp.bfloat16)
    params = LatentDiffusion.init_params(module, cfg)
    app = LatentDiffusion(module, params, cfg)
    ids = jnp.ones((BATCH, 32), jnp.int32)
    neg = jnp.zeros((BATCH, 32), jnp.int32)
    mask = jnp.ones((BATCH, 32), jnp.int32)

    sampler = jax.jit(app.make_sampler(num_steps=STEPS, guidance_scale=7.5))
    sample = lambda rng: sampler(app.params, ids, mask, neg, rng)
    imgs = sample(jax.random.PRNGKey(0))
    float(imgs[0, 0, 0, 0])  # fence (block_until_ready unreliable on axon)

    t0 = time.perf_counter()
    n_rounds = 2
    for i in range(n_rounds):
        imgs = sample(jax.random.PRNGKey(i + 1))
    float(imgs[0, 0, 0, 0])
    elapsed = time.perf_counter() - t0
    ipm = n_rounds * BATCH / elapsed * 60.0
    print(json.dumps({
        "metric": "sd_unet_ddim50_cfg_images_per_min_per_chip",
        "value": round(ipm, 2),
        "unit": "images/min/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
