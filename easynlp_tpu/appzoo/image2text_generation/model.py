"""Image → text generation (captioning).

Capability parity: reference easynlp/appzoo/image2text_generation/ — two
variants: CLIP-ViT visual tokens → GPT (enable_vit) and VQGAN codes → GPT
(enable_vqgan), dispatched by user_defined_parameters (reference
api.py:127-131). Here the ViT variant: patch embeddings are projected into
the GPT embedding space and fed as a prefix; captions decode with the shared
generation engine.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.models.clip import CLIPVisionConfig, ViTEncoder
from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config
from easynlp_tpu.modelzoo.models.gpt2.modeling_gpt2 import GPT2Model
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init
from easynlp_tpu.utils import losses


class I2TConfig(PretrainedConfig):
    model_type = "clip_gpt_i2t"

    def __init__(self, vision_config=None, gpt_config=None, **kwargs):
        self.vision_config_dict = vision_config or {}
        self.gpt_config_dict = gpt_config or {}
        super().__init__(**kwargs)

    @property
    def vision_config(self):
        return CLIPVisionConfig(**self.vision_config_dict)

    @property
    def gpt_config(self):
        return GPT2Config(**self.gpt_config_dict)


class CLIPGPTImageTextModule(BaseModule):
    """prefix = proj(ViT patch tokens); GPT decodes caption after prefix."""

    remat: str = "none"

    def setup(self):
        c = self.config
        gc = c.gpt_config
        self.vision = ViTEncoder(config=c.vision_config, dtype=self.dtype,
                                 remat=self.remat)
        self.gpt = GPT2Model(config=gc, dtype=self.dtype, remat=self.remat)
        # the app owns the token embedding (tied LM head); the GPT stack runs
        # on inputs_embeds so its internal wte never materialises
        self.wte = nn.Embed(gc.vocab_size, gc.n_embd, param_dtype=jnp.float32,
                            embedding_init=nn.with_logical_partitioning(
                                truncated_normal_init(0.02),
                                ("vocab", "embed")))
        self.visual_proj = nn.Dense(
            gc.n_embd, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(0.02), ("embed", "embed_out")))
        self.lm_bias = self.param(
            "lm_bias", nn.with_logical_partitioning(
                nn.initializers.zeros, ("vocab",)),
            (gc.vocab_size,), jnp.float32)

    def encode_image(self, pixel_values, deterministic=True):
        out = self.vision(pixel_values, deterministic=deterministic)
        # all patch tokens (incl. CLS) projected to GPT space
        return self.visual_proj(out["last_hidden_state"])

    def __call__(self, pixel_values, input_ids, attention_mask=None,
                 deterministic=True):
        prefix = self.encode_image(pixel_values, deterministic)  # [B, P, E]
        b, p, _ = prefix.shape
        s = input_ids.shape[1]
        text = self.wte(input_ids).astype(self.dtype)
        tok_emb = self.wte.embedding
        embeds = jnp.concatenate([prefix.astype(self.dtype), text], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((b, p), jnp.int32),
             attention_mask if attention_mask is not None
             else jnp.ones((b, s), jnp.int32)], axis=1)
        out = self.gpt(inputs_embeds=embeds, attention_mask=mask,
                       deterministic=deterministic)["last_hidden_state"]
        logits = jnp.einsum("bse,ve->bsv", out, tok_emb.astype(self.dtype))
        logits = logits + self.lm_bias.astype(self.dtype)
        return {"logits": logits[:, p:],  # text positions only
                "prefix_len": p}


class CLIPGPTImageTextGeneration(Application):
    model_input_keys = ("pixel_values", "input_ids", "attention_mask")

    def sample_inputs(self):
        vc = self.config.vision_config
        return {"pixel_values": jnp.ones(
            (1, vc.image_size, vc.image_size, 3), jnp.float32),
            "input_ids": jnp.ones((1, 6), jnp.int32)}

    @staticmethod
    def loss_fn(outputs, batch):
        # next-token prediction over the caption
        logits = outputs["logits"][:, :-1]
        labels = jnp.where(batch["attention_mask"][:, 1:] > 0,
                           batch["input_ids"][:, 1:], -100)
        return {"loss": losses.cross_entropy(logits, labels,
                                             ignore_index=-100)}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return I2TConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return CLIPGPTImageTextModule(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        vc = config.vision_config
        rng = jax.random.PRNGKey(seed)
        variables = module.init(
            {"params": rng, "dropout": rng},
            pixel_values=jnp.ones((1, vc.image_size, vc.image_size, 3),
                                  jnp.float32),
            input_ids=jnp.ones((1, 6), jnp.int32),
            deterministic=True)
        return nn.unbox(variables["params"])
