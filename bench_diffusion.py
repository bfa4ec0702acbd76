"""Secondary benchmark: SD-1.x-scale latent diffusion sampling throughput
(images/min/chip, 50-step DDIM + CFG + VAE decode at 512x512).

Measurement design (sized to provably fit the 900s leg timeout through a
degraded tunnel): a full 50-step x (warmup + N) run is ~3min of pure device
time per round and timed out in BENCH_r04, so the leg times a PROBE_STEPS-
step DDIM loop (same compiled fori_loop body — per-step cost is
step-count-invariant) and the VAE decode separately, then extrapolates to
the 50-step figure. Both the raw probe timings and the extrapolation are
emitted. After the extrapolated number is ON STDOUT, if enough budget
remains the leg also runs one full 50-step sampling and re-emits with the
directly-measured figure (the later JSON line supersedes — the orchestrator
parses the last one), so a healthy run carries both.

`--prewarm`: compile the probe sampler + decoder into the persistent
compile cache and exit — the orchestrator runs this as its own bounded
subprocess so the measuring leg's timeout window is never eaten by
first-compile.

Prints one JSON line (the driver's primary metric stays bench.py).
"""

import json
import os
import sys
import time

if os.environ.get("BENCH_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

TINY = bool(int(os.environ.get("BENCH_TINY", "0")))

BATCH = 4 if not TINY else 1
STEPS = 50 if not TINY else 4
PROBE_STEPS = 10 if not TINY else 2
PROBE_ROUNDS = 2
# leave this much of the leg's 900s budget unspent before attempting the
# optional full 50-step confirmation run (it costs ~50/PROBE_STEPS probe
# rounds of device time plus a VAE decode)
FULL_RUN_BUDGET_S = float(os.environ.get("BENCH_DIFFUSION_FULL_BUDGET",
                                         "520"))


def _build():
    import jax.numpy as jnp

    from easynlp_tpu.appzoo.latent_diffusion.model import (LatentDiffusion,
                                                           LDMConfig,
                                                           LDMModule)
    from easynlp_tpu.testing import make_args

    make_args()
    if TINY:
        cfg = LDMConfig(
            image_size=32, latent_channels=4, model_channels=32,
            channel_mult=(1, 2), num_res_blocks=1, attention_levels=(1,),
            num_heads=2, context_dim=32, vae_channels=16,
            vae_channel_mult=(1, 2), vae_num_res_blocks=1,
            text_config=dict(vocab_size=100, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=2,
                             intermediate_size=64,
                             max_position_embeddings=64))
    else:
        cfg = LDMConfig(
            image_size=512, latent_channels=4, model_channels=320,
            channel_mult=(1, 2, 4, 4), num_res_blocks=2,
            attention_levels=(1, 2, 3), num_heads=8, context_dim=768,
            vae_channels=128, vae_channel_mult=(1, 2, 4, 4),
            vae_num_res_blocks=2,
            text_config=dict(vocab_size=21128, hidden_size=768,
                             num_hidden_layers=12, num_attention_heads=12,
                             intermediate_size=3072,
                             max_position_embeddings=512))
    module = LDMModule(config=cfg, dtype=jnp.bfloat16)
    # Zero-init via eval_shape instead of init_params: flax init executes
    # eagerly op-by-op (~hundreds of per-parameter truncated_normal
    # dispatches — MINUTES through the tunnel for the ~1B-param SD stack,
    # the dominant cost of the BENCH_r04 timeout). Sampling throughput is
    # data-independent on TPU (same dense FLOPs whatever the weights).
    import jax

    from easynlp_tpu.testing import zeros_like_init

    rng = jax.random.PRNGKey(0)
    params = zeros_like_init(lambda: module.init(
        {"params": rng, "dropout": rng},
        pixel_values=jnp.ones((1, cfg.image_size, cfg.image_size, 3),
                              jnp.float32),
        input_ids=jnp.ones((1, 8), jnp.int32),
        timesteps=jnp.zeros((1,), jnp.int32),
        deterministic=True))
    return LatentDiffusion(module, params, cfg)


def _fns(app):
    import jax

    probe = jax.jit(app.make_sampler(num_steps=PROBE_STEPS,
                                     guidance_scale=7.5, decode=False))
    decoder = jax.jit(app.make_decoder())
    return probe, decoder


def _inputs():
    import jax.numpy as jnp
    ids = jnp.ones((BATCH, 32), jnp.int32)
    neg = jnp.zeros((BATCH, 32), jnp.int32)
    mask = jnp.ones((BATCH, 32), jnp.int32)
    return ids, mask, neg


def main():
    import jax

    from easynlp_tpu.utils.initializer import enable_compile_cache
    enable_compile_cache()

    t_leg0 = time.perf_counter()
    app = _build()
    probe, decoder = _fns(app)
    ids, mask, neg = _inputs()

    def fence(x):
        # block_until_ready can return early on the axon tunnel; a scalar
        # device->host fetch is the only reliable fence
        float(x.reshape(-1)[0])

    # warmup (compile or cache load) then timed probe rounds
    lat = probe(app.params, ids, mask, neg, jax.random.PRNGKey(0))
    fence(lat)
    t0 = time.perf_counter()
    for i in range(PROBE_ROUNDS):
        lat = probe(app.params, ids, mask, neg, jax.random.PRNGKey(i + 1))
    fence(lat)
    probe_s = (time.perf_counter() - t0) / PROBE_ROUNDS
    # per-step cost: the probe run also contains one text-tower encode
    # (cond+uncond, ~2 x 12-layer BERT fwd on 32 tokens — sub-percent of a
    # 320-channel UNet step at 64x64), charged to the steps (conservative)
    step_s = probe_s / PROBE_STEPS

    imgs = decoder(app.params, lat)
    fence(imgs)
    t0 = time.perf_counter()
    imgs = decoder(app.params, lat)
    fence(imgs)
    vae_s = time.perf_counter() - t0

    full_s_extrap = STEPS * step_s + vae_s
    ipm = BATCH / full_s_extrap * 60.0
    record = {
        "metric": "sd_unet_ddim50_cfg_images_per_min_per_chip",
        "value": round(ipm, 2),
        "unit": "images/min/chip",
        "vs_baseline": None,
        "extras": {
            # raw measurements the extrapolation derives from
            "ddim_step_ms": round(step_s * 1000.0, 1),
            "vae_decode_ms": round(vae_s * 1000.0, 1),
            "probe_steps": PROBE_STEPS,
            "probe_rounds": PROBE_ROUNDS,
            "batch": BATCH,
            "extrapolated": True,
        },
    }
    print(json.dumps(record), flush=True)  # the number is safe NOW

    # optional confirmation: one full 50-step sampling, only if it fits the
    # remaining leg budget comfortably (compile reuses the probe's cached
    # body only if step count matches, so this pays its own compile once;
    # the persistent cache amortises it across rounds)
    spent = time.perf_counter() - t_leg0
    est_full = STEPS * step_s + vae_s
    if spent + est_full < FULL_RUN_BUDGET_S:
        sampler = jax.jit(app.make_sampler(num_steps=STEPS,
                                           guidance_scale=7.5))
        imgs = sampler(app.params, ids, mask, neg, jax.random.PRNGKey(9))
        fence(imgs)
        t0 = time.perf_counter()
        imgs = sampler(app.params, ids, mask, neg, jax.random.PRNGKey(10))
        fence(imgs)
        full_s = time.perf_counter() - t0
        record["extras"]["images_per_min_full_run"] = round(
            BATCH / full_s * 60.0, 2)
        record["extras"]["extrapolation_error_pct"] = round(
            (full_s_extrap / full_s - 1.0) * 100.0, 1)
        print(json.dumps(record), flush=True)
    return 0


def prewarm():
    """Compile the probe sampler + VAE decoder into the persistent cache
    (one bounded subprocess so the measuring leg starts warm)."""
    import jax

    from easynlp_tpu.utils.initializer import enable_compile_cache
    enable_compile_cache()
    app = _build()
    probe, decoder = _fns(app)
    ids, mask, neg = _inputs()
    lat = probe(app.params, ids, mask, neg, jax.random.PRNGKey(0))
    imgs = decoder(app.params, lat)
    float(imgs.reshape(-1)[0])
    print(json.dumps({"prewarmed": "diffusion"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(prewarm() if "--prewarm" in sys.argv else main())
