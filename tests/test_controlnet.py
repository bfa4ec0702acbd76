"""ControlNet tests: zero-init no-op property, shape alignment with the
UNet skip list, gradient flow, and the conditioned sampler end-to-end.

Capability parity: reference diffusion/chinese_sd_webui (Chinese_Controlnet
checkpoints injected into the PAI diffusion UNet)."""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.appzoo.latent_diffusion.model import (
    LatentDiffusion,
    LDMConfig,
    LDMModule,
)
from easynlp_tpu.modelzoo.models.latent_diffusion.controlnet import (
    ControlNetModel,
    edge_hint,
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


def test_edge_hint_shape_and_range():
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3) * 2 - 1,
                       jnp.float32)
    hint = edge_hint(imgs)
    assert hint.shape == (2, 16, 16, 3)
    vals = np.unique(np.asarray(hint))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_fresh_controlnet_is_noop():
    """Zero convs at init → predict_noise with control == without, exactly
    (the ControlNet training-stability property)."""
    app = _tiny_app()
    cparams = app.init_controlnet_params(seed=0)
    lat = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 2), jnp.float32)
    hint = jnp.asarray(np.random.RandomState(2).rand(2, 16, 16, 3),
                       jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jnp.asarray(np.random.RandomState(3).randn(2, 6, 16), jnp.float32)
    module = app.module
    cnet = ControlNetModel(config=app.config, dtype=jnp.float32)
    downs, mid = cnet.apply({"params": cparams}, lat, hint, t, ctx)
    assert float(jnp.abs(mid).max()) == 0.0
    assert all(float(jnp.abs(d).max()) == 0.0 for d in downs)
    base = module.apply({"params": app.params}, lat, t, ctx,
                        method=module.predict_noise)
    ctrl = module.apply({"params": app.params}, lat, t, ctx,
                        method=module.predict_noise, control=(downs, mid))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ctrl))


def test_controlnet_residuals_align_with_skips():
    """Non-zero residuals flow through the UNet without shape errors and
    change the output (the skip-list alignment assert inside UNetModel)."""
    app = _tiny_app()
    cparams = app.init_controlnet_params(seed=0)
    # un-zero the zero convs so residuals are non-trivial
    cparams = jax.tree.map(
        lambda x: x + 0.01 if x.ndim >= 1 else x, cparams)
    lat = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 2), jnp.float32)
    hint = jnp.ones((1, 16, 16, 3), jnp.float32)
    t = jnp.array([5], jnp.int32)
    ctx = jnp.zeros((1, 4, 16), jnp.float32)
    cnet = ControlNetModel(config=app.config, dtype=jnp.float32)
    downs, mid = cnet.apply({"params": cparams}, lat, hint, t, ctx)
    module = app.module
    base = module.apply({"params": app.params}, lat, t, ctx,
                        method=module.predict_noise)
    ctrl = module.apply({"params": app.params}, lat, t, ctx,
                        method=module.predict_noise, control=(downs, mid))
    assert ctrl.shape == base.shape
    assert float(jnp.abs(ctrl - base).max()) > 0


def test_controlnet_encoder_clone_copies_unet():
    app = _tiny_app()
    cparams = app.init_controlnet_params(seed=0)
    unet = app.params["unet"]
    shared = [k for k in cparams if k in unet]
    assert "conv_in" in shared and any(k.startswith("down_") for k in shared)
    for k in shared:
        a = jax.tree.leaves(cparams[k])
        b = jax.tree.leaves(unet[k])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_controlnet_grad_flows():
    """Simplified ControlNet finetune step: eps-MSE loss w.r.t. control
    params has non-zero grad through the zero convs' inputs (kernels are
    zero but biases/hint ladder still receive signal via the UNet)."""
    import optax
    app = _tiny_app()
    cparams = app.init_controlnet_params(seed=0)
    lat = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 2), jnp.float32)
    hint = jnp.ones((2, 16, 16, 3), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jnp.zeros((2, 4, 16), jnp.float32)
    target = jnp.zeros_like(lat)
    cnet = ControlNetModel(config=app.config, dtype=jnp.float32)
    module = app.module

    def loss(cp):
        downs, mid = cnet.apply({"params": cp}, lat, hint, t, ctx)
        eps = module.apply({"params": app.params}, lat, t, ctx,
                           method=module.predict_noise, control=(downs, mid))
        return jnp.mean((eps - target) ** 2)

    g = jax.grad(loss)(cparams)
    assert float(optax.global_norm(g)) > 0


def test_controlnet_trainer_freezes_base(tmp_path):
    """ControlNetApplication through the Trainer: base bit-exact frozen,
    control params move, checkpoint carries base + control artifacts, and
    load_control on a fresh base samples from the trained ControlNet."""
    import os

    from easynlp_tpu.appzoo.latent_diffusion.controlnet_app import (
        ControlNetApplication)
    from easynlp_tpu.core.trainer import Trainer

    inner = _tiny_app()
    app = ControlNetApplication(inner)
    base_before = jax.device_get(app.params["base"])
    ctrl_before = jax.device_get(app.params["control"])

    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"pixel_values": (rng.rand(16, 16, 3) * 2 - 1
                                     ).astype(np.float32),
                    "input_ids": rng.randint(1, 40, 8).astype(np.int32)}

        def batch_fn(self, ex):
            return {k: np.stack([e[k] for e in ex]) for k in ex[0]}

    out = str(tmp_path / "ck")
    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                     learning_rate=1e-3)
    tr = Trainer(app, DS(), evaluator=None, args=args)
    tr.train()

    after = jax.device_get(tr.params)
    for a, b in zip(jax.tree.leaves(base_before),
                    jax.tree.leaves(after["base"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(jax.tree.leaves(ctrl_before),
                        jax.tree.leaves(after["control"])))
    assert moved, "no control parameter moved"
    for fname in ("flax_params.msgpack", "flax_params_control.msgpack"):
        assert os.path.exists(os.path.join(out, fname)), fname

    fresh = _tiny_app()
    capp = ControlNetApplication.load_control(fresh, out)
    for a, b in zip(jax.tree.leaves(jax.device_get(capp.params["control"])),
                    jax.tree.leaves(after["control"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    imgs = capp.sample(jnp.ones((1, 6), jnp.int32), None,
                       jnp.zeros((1, 6), jnp.int32),
                       jnp.ones((1, 16, 16, 3), jnp.float32),
                       jax.random.PRNGKey(0), num_steps=2,
                       guidance_scale=1.0)
    assert np.isfinite(np.asarray(imgs)).all()


def test_controlnet_cli_end_to_end(tmp_path):
    """--enable_controlnet through the CLI on latent_diffusion."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))
    from make_fixtures import make_image_b64, make_vocab

    base = str(tmp_path)
    tsv = os.path.join(base, "ldm.tsv")
    with open(tsv, "w") as f:
        for i in range(8):
            # 4th column = precomputed conditioning map (depth-style hint)
            f.write("%d\tnice picture %d\t%s\t%s\n"
                    % (i, i, make_image_b64(seed=i, size=16),
                       make_image_b64(seed=100 + i, size=16)))
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
        "--input_schema=id:str:1,text:str:1,image:str:1,hint:str:1",
        "--first_sequence=text", "--second_sequence=image",
        "--checkpoint_dir=" + out, "--epoch_num=1",
        "--micro_batch_size=8", "--sequence_length=8",
        "--learning_rate=1e-4", "--dtype=float32",
        "--user_defined_parameters="
        "pretrain_model_name_or_path=%s enable_controlnet=True "
        "controlnet_hint_column=hint image_size=16" % model,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "flax_params_control.msgpack"))
    global_vars._GLOBAL_ARGS = None
    make_args()


def test_controlnet_sampler_end_to_end():
    app = _tiny_app()
    cparams = app.init_controlnet_params(seed=0)
    sampler = app.make_controlnet_sampler(num_steps=2, guidance_scale=2.0)
    imgs = sampler(app.params, cparams,
                   jnp.ones((1, 6), jnp.int32), None,
                   jnp.zeros((1, 6), jnp.int32),
                   jnp.ones((1, 16, 16, 3), jnp.float32),
                   jax.random.PRNGKey(0))
    assert imgs.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()
