"""OLSS learned scheduler (reference diffusion/olss_scheduler/olss.py,
arXiv:2305.14677): teacher-path collection, lstsq solve, and the accelerated
sampler tracking the teacher."""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
    DiffusionSchedule, ddim_sample)
from easynlp_tpu.modelzoo.models.latent_diffusion.olss import (
    ddim_collect_path, fit_olss, load_olss, olss_sample, save_olss)


def _toy_denoise(x, t):
    """A cheap deterministic 'model': eps depends smoothly on (x, t)."""
    tt = (t.astype(jnp.float32) / 100.0)[:, None, None, None]
    return jnp.tanh(x) * (0.5 + 0.1 * tt) + 0.05 * tt


def test_collect_path_matches_ddim():
    """The scanned collector's final state equals the plain DDIM sampler."""
    sched = DiffusionSchedule(100)
    shape = (2, 4, 4, 2)
    rng = jax.random.PRNGKey(0)
    t_path, x_path, e_path = ddim_collect_path(_toy_denoise, shape, sched,
                                               num_steps=16, rng=rng)
    ref = ddim_sample(_toy_denoise, shape, sched, num_steps=16, eta=0.0,
                      rng=rng)
    assert t_path.shape == (16,) and t_path[0] > t_path[-1]
    assert x_path.shape == (17,) + shape and e_path.shape == (16,) + shape
    np.testing.assert_allclose(x_path[-1], np.asarray(ref), atol=1e-5)


def test_olss_tracks_teacher_better_than_naive(tmp_path):
    """4-step OLSS fitted on a 16-step teacher reproduces the teacher's
    final state far better than naive 4-step DDIM."""
    sched = DiffusionSchedule(100)
    shape = (2, 4, 4, 2)
    rng = jax.random.PRNGKey(1)
    t_path, x_path, e_path = ddim_collect_path(_toy_denoise, shape, sched,
                                               num_steps=16, rng=rng)
    teacher_final = x_path[-1]
    olss_params = fit_olss(t_path, x_path, e_path, num_accelerate_steps=4)
    timesteps, wx, we = olss_params
    assert len(timesteps) <= 4

    xT = jnp.asarray(x_path[0])
    student = np.asarray(olss_sample(_toy_denoise, xT, timesteps, wx, we))
    naive = np.asarray(ddim_sample(_toy_denoise, shape, sched, num_steps=4,
                                   eta=0.0, rng=rng, x_init=xT))
    err_olss = float(np.mean((student - teacher_final) ** 2))
    err_naive = float(np.mean((naive - teacher_final) ** 2))
    assert err_olss < err_naive * 0.5, (err_olss, err_naive)
    assert err_olss < 1e-3

    # save/load roundtrip
    p = str(tmp_path / "olss.npz")
    save_olss(p, *olss_params)
    t2, wx2, we2 = load_olss(p)
    np.testing.assert_array_equal(t2, np.asarray(timesteps))
    np.testing.assert_allclose(wx2, wx)
    np.testing.assert_allclose(we2, we)


def test_app_fit_and_sample_olss():
    """LatentDiffusion.fit_olss + make_olss_sampler end-to-end on the tiny
    LDM: finite images at the configured resolution."""
    from easynlp_tpu.appzoo.latent_diffusion.model import (LatentDiffusion,
                                                           LDMConfig,
                                                           LDMModule)
    from easynlp_tpu.testing import make_args
    make_args()
    cfg = LDMConfig(image_size=16, latent_channels=2, model_channels=16,
                    channel_mult=(1, 2), num_res_blocks=1,
                    attention_levels=(1,), num_heads=2, context_dim=16,
                    vae_channels=8, vae_channel_mult=(1, 2),
                    vae_num_res_blocks=1,
                    text_config=dict(vocab_size=50, hidden_size=16,
                                     num_hidden_layers=1,
                                     num_attention_heads=2,
                                     intermediate_size=32,
                                     max_position_embeddings=16))
    module = LDMModule(config=cfg, dtype=jnp.float32)
    params = LatentDiffusion.init_params(module, cfg)
    app = LatentDiffusion(module, params, cfg)

    ids = jnp.ones((1, 8), jnp.int32)
    olss_params = app.fit_olss(ids, teacher_steps=8, student_steps=3,
                               guidance_scale=1.0)
    sampler = jax.jit(app.make_olss_sampler(olss_params, guidance_scale=1.0))
    img = sampler(app.params, ids, None, jnp.zeros_like(ids),
                  jax.random.PRNGKey(0))
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_dpm_solver_pp_beats_ddim_at_few_steps():
    """10-step DPM-Solver++(2M) approximates the 100-step DDIM limit better
    than 10-step DDIM on the toy model (its whole selling point)."""
    from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
        dpm_solver_pp_sample)
    sched = DiffusionSchedule(1000)
    shape = (2, 4, 4, 2)
    rng = jax.random.PRNGKey(2)
    xT = jax.random.normal(rng, shape, jnp.float32)
    ref = np.asarray(ddim_sample(_toy_denoise, shape, sched, num_steps=200,
                                 eta=0.0, rng=rng, x_init=xT))
    fast = np.asarray(dpm_solver_pp_sample(_toy_denoise, shape, sched,
                                           num_steps=10, rng=rng, x_init=xT))
    slow = np.asarray(ddim_sample(_toy_denoise, shape, sched, num_steps=10,
                                  eta=0.0, rng=rng, x_init=xT))
    err_fast = float(np.mean((fast - ref) ** 2))
    err_slow = float(np.mean((slow - ref) ** 2))
    assert np.isfinite(fast).all()
    assert err_fast < err_slow, (err_fast, err_slow)


def test_app_sampler_methods():
    """make_sampler method switch: plms and dpm++ produce finite images."""
    from easynlp_tpu.appzoo.latent_diffusion.model import (LatentDiffusion,
                                                           LDMConfig,
                                                           LDMModule)
    from easynlp_tpu.testing import make_args
    make_args()
    cfg = LDMConfig(image_size=16, latent_channels=2, model_channels=16,
                    channel_mult=(1, 2), num_res_blocks=1,
                    attention_levels=(1,), num_heads=2, context_dim=16,
                    vae_channels=8, vae_channel_mult=(1, 2),
                    vae_num_res_blocks=1,
                    text_config=dict(vocab_size=50, hidden_size=16,
                                     num_hidden_layers=1,
                                     num_attention_heads=2,
                                     intermediate_size=32,
                                     max_position_embeddings=16))
    module = LDMModule(config=cfg, dtype=jnp.float32)
    params = LatentDiffusion.init_params(module, cfg)
    app = LatentDiffusion(module, params, cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    for method in ("plms", "dpm++"):
        img = app.sample(ids, num_steps=3, guidance_scale=1.0, method=method)
        assert img.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all(), method


def _tiny_app_for_edit():
    from easynlp_tpu.appzoo.latent_diffusion.model import (LatentDiffusion,
                                                           LDMConfig,
                                                           LDMModule)
    from easynlp_tpu.testing import make_args
    make_args()
    cfg = LDMConfig(image_size=16, latent_channels=2, model_channels=16,
                    channel_mult=(1, 2), num_res_blocks=1,
                    attention_levels=(1,), num_heads=2, context_dim=16,
                    vae_channels=8, vae_channel_mult=(1, 2),
                    vae_num_res_blocks=1,
                    text_config=dict(vocab_size=50, hidden_size=16,
                                     num_hidden_layers=1,
                                     num_attention_heads=2,
                                     intermediate_size=32,
                                     max_position_embeddings=16))
    module = LDMModule(config=cfg, dtype=jnp.float32)
    params = LatentDiffusion.init_params(module, cfg)
    return LatentDiffusion(module, params, cfg)


def test_free_prompt_editing():
    """FreeSAP editing (reference diffusion/FreePromptEditing): same prompt
    in both branches + sharing => identical rows; different target prompt
    => rows differ but sharing keeps the edit closer to the source than an
    independent generation."""
    app = _tiny_app_for_edit()
    rng = jax.random.PRNGKey(0)
    src = jnp.asarray([[5, 6, 7, 8, 9, 10, 11, 12]], jnp.int32)
    tgt = jnp.asarray([[5, 6, 20, 8, 9, 10, 11, 12]], jnp.int32)

    same = np.asarray(app.edit(src, src, num_steps=4, guidance_scale=1.0,
                               share_frac=0.5, rng=rng))
    np.testing.assert_allclose(same[0], same[1], atol=1e-5)

    out = np.asarray(app.edit(src, tgt, num_steps=4, guidance_scale=1.0,
                              share_frac=0.75, rng=rng))
    assert np.isfinite(out).all()
    d_edit = float(np.mean((out[1] - out[0]) ** 2))
    assert d_edit > 0  # the target prompt changed the image

    # sharing measurably alters the target branch vs independent generation
    # (the "stays closer to source" property needs a TRAINED model; on a
    # random init we assert the mechanism engages, not its perceptual effect)
    indep = np.asarray(app.edit(src, tgt, num_steps=4, guidance_scale=1.0,
                                share_frac=0.0, rng=rng))
    np.testing.assert_allclose(indep[0], out[0], atol=1e-5)  # src unaffected
    assert float(np.mean((indep[1] - out[1]) ** 2)) > 0


def test_stylize_video_cross_frame():
    """DiffSynth-core video stylization: img2img over frames with cross-
    frame attention; strength bounds respected; temporal blend engages."""
    app = _tiny_app_for_edit()
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(3, 16, 16, 3) * 2 - 1, jnp.float32)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)

    out = app.stylize_video(frames, ids, strength=0.6, num_steps=4,
                            guidance_scale=1.0)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    # cross-frame attention makes frame outputs interdependent: changing
    # frame 2 must perturb frame 0's output
    frames2 = frames.at[2].set(-frames[2])
    out2 = app.stylize_video(frames2, ids, strength=0.6, num_steps=4,
                             guidance_scale=1.0)
    assert float(np.mean((np.asarray(out2[0]) - np.asarray(out[0])) ** 2)) > 0

    # temporal blending changes the result (smoother seam engaged)
    out3 = app.stylize_video(frames, ids, strength=0.6, num_steps=4,
                             guidance_scale=1.0, temporal_blend=0.5)
    assert float(np.mean((np.asarray(out3) - np.asarray(out)) ** 2)) > 0
