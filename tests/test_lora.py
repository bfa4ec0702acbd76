"""LoRA adapter finetuning (reference diffusion/diffusers_api LoRA for
PAI-Diffusion — /root/reference/diffusion/README.md): generic wrapper
mechanics, CLI --enable_lora on latent_diffusion, and sampling from a LoRA
checkpoint."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "fixtures"))

TINY_LDM = dict(image_size=16, latent_channels=2, model_channels=16,
                channel_mult=(1, 2), num_res_blocks=1, attention_levels=(1,),
                num_heads=2, context_dim=16, vae_channels=8,
                vae_channel_mult=(1, 2), vae_num_res_blocks=1,
                text_config=dict(vocab_size=60, hidden_size=16,
                                 num_hidden_layers=1, num_attention_heads=2,
                                 intermediate_size=32,
                                 max_position_embeddings=16))


def _tiny_ldm_app():
    from easynlp_tpu.appzoo.latent_diffusion.model import (LatentDiffusion,
                                                           LDMConfig,
                                                           LDMModule)
    from easynlp_tpu.testing import make_args
    make_args()
    cfg = LDMConfig(**TINY_LDM)
    module = LDMModule(config=cfg, dtype=jnp.float32)
    params = LatentDiffusion.init_params(module, cfg)
    return LatentDiffusion(module, params, cfg)


def test_lora_freezes_base_trains_adapters(tmp_path):
    """Trainer + LoRA wrapper: base bit-exact frozen, adapters move, loss
    finite; checkpoint carries merged + adapter + base artifacts."""
    from easynlp_tpu.core.lora_app import LoRAApplication
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import make_args

    inner = _tiny_ldm_app()
    app = LoRAApplication(inner, rank=2)
    base_before = jax.device_get(app.params["base"])
    lora_before = jax.device_get(app.params["lora"])

    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"pixel_values": (rng.rand(16, 16, 3) * 2 - 1
                                     ).astype(np.float32),
                    "input_ids": rng.randint(1, 50, 8).astype(np.int32)}

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
        for a, b in zip(jax.tree.leaves(lora_before),
                        jax.tree.leaves(after["lora"])))
    assert moved, "no adapter parameter moved"
    for fname in ("flax_params.msgpack", "flax_params_lora.msgpack",
                  "flax_params_base.msgpack"):
        assert os.path.exists(os.path.join(out, fname)), fname

    # the main artifact is MERGED weights: a plain (LoRA-unaware) app loads
    # it and its forward equals base+adapters
    from easynlp_tpu.modelzoo.lora import lora_merge
    from easynlp_tpu.modelzoo.modeling_utils import load_params
    merged_disk = load_params(out, target=jax.device_get(inner.params))
    merged_live = jax.device_get(
        lora_merge(after["base"], after["lora"], app.scale))
    for a, b in zip(jax.tree.leaves(merged_disk),
                    jax.tree.leaves(merged_live)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_resume_restores_adapters(tmp_path):
    from easynlp_tpu.core.lora_app import LoRAApplication
    from easynlp_tpu.core.trainer import Trainer
    from easynlp_tpu.testing import make_args

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"pixel_values": (rng.rand(16, 16, 3) * 2 - 1
                                     ).astype(np.float32),
                    "input_ids": rng.randint(1, 50, 8).astype(np.int32)}

        def batch_fn(self, ex):
            return {k: np.stack([e[k] for e in ex]) for k in ex[0]}

    out = str(tmp_path / "ck")
    args = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                     epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                     learning_rate=1e-3)
    app = LoRAApplication(_tiny_ldm_app(), rank=2)
    tr = Trainer(app, DS(), evaluator=None, args=args)
    tr.train()
    trained = jax.device_get(tr.params)

    args2 = make_args(micro_batch_size=8, sequence_length=8, dtype="float32",
                      epoch_num=1.0, logging_steps=10**9, checkpoint_dir=out,
                      learning_rate=1e-3, resume_from_checkpoint=out)
    app2 = LoRAApplication(_tiny_ldm_app(), rank=2)
    tr2 = Trainer(app2, DS(), evaluator=None, args=args2)
    assert tr2.global_step == tr.t_total
    restored = jax.device_get(tr2.params)
    for key in ("base", "lora"):
        for a, b in zip(jax.tree.leaves(trained[key]),
                        jax.tree.leaves(restored[key])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)


def test_lora_cli_latent_diffusion_and_sample(tmp_path):
    """--enable_lora end-to-end: CLI trains latent_diffusion with adapters,
    the checkpoint samples (a) via the merged main artifact with a plain
    LatentDiffusion and (b) via load_adapter on a fresh base."""
    from make_fixtures import make_image_b64, make_vocab

    base = str(tmp_path)
    tsv = os.path.join(base, "ldm.tsv")
    with open(tsv, "w") as f:
        for i in range(8):
            f.write("%d\tnice picture %d\t%s\n"
                    % (i, i, make_image_b64(seed=i, size=16)))
    model = os.path.join(base, "tiny-ldm")
    os.makedirs(model)
    v = make_vocab(os.path.join(model, "vocab.txt"))
    cfg = dict(TINY_LDM, model_type="latent_diffusion")
    cfg["text_config"] = dict(cfg["text_config"], vocab_size=v)
    with open(os.path.join(model, "config.json"), "w") as f:
        json.dump(cfg, f)

    from easynlp_tpu import cli
    from easynlp_tpu.utils import global_vars
    out = os.path.join(base, "ck")
    global_vars._GLOBAL_ARGS = None
    rc = cli.main([
        "--mode=train", "--app_name=latent_diffusion",
        "--tables=%s,%s" % (tsv, tsv),
        "--input_schema=id:str:1,text:str:1,image:str:1",
        "--first_sequence=text", "--second_sequence=image",
        "--checkpoint_dir=" + out, "--epoch_num=1",
        "--micro_batch_size=8", "--sequence_length=8",
        "--learning_rate=1e-4", "--dtype=float32",
        "--user_defined_parameters="
        "pretrain_model_name_or_path=%s enable_lora=True lora_rank=2 "
        "image_size=16" % model,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "flax_params_lora.msgpack"))

    # (a) merged checkpoint sampling through a LoRA-unaware app
    from easynlp_tpu.appzoo.latent_diffusion.model import LatentDiffusion
    global_vars._GLOBAL_ARGS = None
    from easynlp_tpu.testing import make_args
    make_args()
    app = LatentDiffusion.from_pretrained(out, dtype=jnp.float32)
    ids = jnp.ones((1, 8), jnp.int32)
    img = app.sample(ids, num_steps=2, guidance_scale=1.0)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()

    # (b) adapter attached to a fresh base
    from easynlp_tpu.core.lora_app import LoRAApplication
    fresh = LatentDiffusion.from_pretrained(model, dtype=jnp.float32)
    lapp = LoRAApplication.load_adapter(fresh, out, rank=2)
    merged = lapp.merged_params()
    img2 = jax.jit(lapp.inner.make_sampler(num_steps=2, guidance_scale=1.0))(
        merged, ids, None, jnp.zeros_like(ids), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(img2)).all()
