import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.appzoo.latent_diffusion.model import (
    LatentDiffusion,
    LDMConfig,
    LDMModule,
)
from easynlp_tpu.modelzoo.models.latent_diffusion.ddim import (
    DiffusionSchedule,
)
from easynlp_tpu.testing import make_args

TINY = dict(image_size=16, latent_channels=2, model_channels=16,
            channel_mult=(1, 2), num_res_blocks=1, attention_levels=(1,),
            num_heads=2, context_dim=16, vae_channels=8,
            vae_channel_mult=(1, 2), vae_num_res_blocks=1,
            text_config=dict(vocab_size=50, hidden_size=16,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=32,
                             max_position_embeddings=16))


def _tiny_app():
    make_args()
    cfg = LDMConfig(**TINY)
    module = LDMModule(config=cfg, dtype=jnp.float32)
    params = LatentDiffusion.init_params(module, cfg)
    return LatentDiffusion(module, params, cfg)


def test_schedule_qsample():
    sched = DiffusionSchedule(100)
    x0 = jnp.ones((2, 4, 4, 2))
    noise = jnp.zeros_like(x0)
    # t=0: almost no noise → x ≈ x0
    x = sched.q_sample(x0, jnp.zeros((2,), jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0) *
                               float(sched.sqrt_alphas_cumprod[0]), rtol=1e-5)
    # monotonic noising
    assert float(sched.sqrt_one_minus[99]) > float(sched.sqrt_one_minus[0])


def test_ldm_train_loss_and_grad():
    app = _tiny_app()
    batch = {"pixel_values": jnp.asarray(
        np.random.RandomState(0).rand(2, 16, 16, 3) * 2 - 1, jnp.float32),
        "input_ids": jnp.ones((2, 6), jnp.int32)}
    loss_fn = app.make_train_loss()
    loss, aux = loss_fn(app.params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    import optax
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0))[0])(
        app.params)
    assert float(optax.global_norm(g)) > 0


def test_ldm_sampling_shapes():
    app = _tiny_app()
    imgs = app.sample(jnp.ones((1, 6), jnp.int32), num_steps=3,
                      guidance_scale=1.0)
    assert imgs.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_ldm_cli_predict_mode(tmp_path):
    """--mode=predict on latent_diffusion: prompt TSV -> base64-PNG column
    through LDMPredictor (the registry used to map this app to the
    Application class and predict mode crashed at construction)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
    from make_fixtures import make_image_b64, make_vocab

    from easynlp_tpu.testing import make_args

    base = str(tmp_path)
    tsv = os.path.join(base, "ldm.tsv")
    with open(tsv, "w") as f:
        for i in range(8):  # batch must tile the 8-device test mesh
            f.write("%d\tnice picture %d\t%s\n"
                    % (i, i, make_image_b64(seed=i, size=16)))
    model = os.path.join(base, "tiny-ldm")
    os.makedirs(model)
    v = make_vocab(os.path.join(model, "vocab.txt"))
    cfg = dict(TINY, model_type="latent_diffusion")
    cfg["text_config"] = dict(cfg["text_config"], vocab_size=v)
    with open(os.path.join(model, "config.json"), "w") as f:
        json.dump(cfg, f)

    from easynlp_tpu import cli
    from easynlp_tpu.utils import global_vars
    out = os.path.join(base, "ck")
    global_vars._GLOBAL_ARGS = None
    rc = cli.main([
        "--mode=train", "--app_name=latent_diffusion",
        "--tables=%s" % tsv,
        "--input_schema=id:str:1,text:str:1,image:str:1",
        "--first_sequence=text", "--second_sequence=image",
        "--checkpoint_dir=" + out, "--epoch_num=1",
        "--micro_batch_size=8", "--sequence_length=8",
        "--learning_rate=1e-4", "--dtype=float32",
        "--user_defined_parameters="
        "pretrain_model_name_or_path=%s image_size=16" % model,
    ])
    assert rc == 0
    pred = os.path.join(base, "pred.tsv")
    global_vars._GLOBAL_ARGS = None
    rc = cli.main([
        "--mode=predict", "--app_name=latent_diffusion",
        "--tables=%s" % tsv,
        "--input_schema=id:str:1,text:str:1,image:str:1",
        "--first_sequence=text",
        "--outputs=%s" % pred,
        "--output_schema=predictions",
        "--append_cols=text",
        "--micro_batch_size=8", "--sequence_length=8",
        "--checkpoint_dir=" + out, "--dtype=float32",
        "--user_defined_parameters=num_steps=2 image_size=16",
    ])
    assert rc == 0
    import base64
    with open(pred) as f:
        lines = [ln.rstrip("\n").split("\t") for ln in f if ln.strip()]
    assert len(lines) == 8
    for cols in lines:
        png = base64.b64decode(cols[0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    global_vars._GLOBAL_ARGS = None
    make_args()
