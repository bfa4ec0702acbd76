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

    def _lm_logits(self, hidden):
        tok_emb = self.wte.embedding
        logits = jnp.einsum("bse,ve->bsv", hidden,
                            jnp.asarray(tok_emb).astype(self.dtype))
        return logits + self.lm_bias.astype(self.dtype)

    def init_lm_cache(self, batch_size, max_length, dtype=None):
        gc = self.config.gpt_config
        h, d = gc.n_head, gc.n_embd // gc.n_head
        dtype = dtype or self.dtype
        return {
            "k": jnp.zeros((gc.n_layer, batch_size, max_length, h, d), dtype),
            "v": jnp.zeros((gc.n_layer, batch_size, max_length, h, d), dtype),
            "index": jnp.zeros((), jnp.int32),
            "mask": jnp.zeros((batch_size, max_length), jnp.int32),
        }

    def caption_prefill(self, pixel_values, input_ids, attention_mask,
                        cache):
        """Prefill: [visual prefix; prompt tokens] through the GPT with a
        static KV cache (reference image2text_generation/model.py's generate
        — autoregressive captioning after the image prefix)."""
        prefix = self.encode_image(pixel_values, True).astype(self.dtype)
        b, p, _ = prefix.shape
        text = self.wte(input_ids).astype(self.dtype)
        embeds = jnp.concatenate([prefix, text], axis=1)
        full_mask = jnp.concatenate(
            [jnp.ones((b, p), jnp.int32), attention_mask.astype(jnp.int32)],
            axis=1)
        out = self.gpt(inputs_embeds=embeds, attention_mask=full_mask,
                       cache=cache, deterministic=True)
        return {"logits": self._lm_logits(out["last_hidden_state"]),
                "cache": out["cache"]}

    def caption_decode(self, input_ids, position_ids, cache):
        emb = self.wte(input_ids).astype(self.dtype)
        out = self.gpt(inputs_embeds=emb, position_ids=position_ids,
                       attention_mask=jnp.ones_like(input_ids), cache=cache,
                       deterministic=True)
        return {"logits": self._lm_logits(out["last_hidden_state"]),
                "cache": out["cache"]}

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


def make_caption_generation_fns(module, pixel_values, prefix_len, cache_len,
                                module_cls=None):
    """(prefill, decode) closures for prefix-conditioned captioning. The
    visual prefix occupies cache slots [0, prefix_len); the engine's token
    buffer tracks only text tokens."""
    module_cls = module_cls or type(module)

    def prefill(params, input_ids, attention_mask):
        b, p = input_ids.shape
        pv = pixel_values
        if pv.shape[0] != b:  # beam search expands the batch by K
            pv = jnp.repeat(pv, b // pv.shape[0], axis=0)
        cache = module.init_lm_cache(b, cache_len)
        full_mask = jnp.concatenate(
            [jnp.ones((b, prefix_len), jnp.int32),
             attention_mask.astype(jnp.int32)], axis=1)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], full_mask, (0, 0))
        out = module.apply({"params": params}, pv, input_ids, attention_mask,
                           cache, method=module_cls.caption_prefill)
        return out["logits"][:, -1].astype(jnp.float32), out["cache"]

    def decode(params, token, cache):
        b = token.shape[0]
        positions = jnp.sum(cache["mask"], axis=-1, keepdims=True)
        cache = dict(cache)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((b, 1), jnp.int32), (0, cache["index"]))
        out = module.apply({"params": params}, token, positions, cache,
                           method=module_cls.caption_decode)
        return out["logits"][:, -1].astype(jnp.float32), out["cache"]

    def reindex_cache(cache, flat_beam):
        return {
            "k": jnp.take(cache["k"], flat_beam, axis=1),
            "v": jnp.take(cache["v"], flat_beam, axis=1),
            "mask": jnp.take(cache["mask"], flat_beam, axis=0),
            "index": cache["index"],
        }

    prefill.reindex_cache = reindex_cache
    return prefill, decode


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

    def generate(self, pixel_values, max_length=32, bos_token_id=101,
                 eos_token_id=102, pad_token_id=0, num_beams=1,
                 do_sample=False, top_k=0, temperature=1.0, rng=None):
        """Decode a caption after the visual prefix (reference
        image2text_generation/model.py generate → decode_to_text)."""
        from easynlp_tpu.modelzoo.generation_utils import generate
        pv = jnp.asarray(pixel_values)
        b = pv.shape[0]
        prefix_shape = jax.eval_shape(
            lambda p, x: self.module.apply(
                {"params": p}, x, method=type(self.module).encode_image),
            self.params, pv)
        prefix_len = prefix_shape.shape[1]
        cache_len = prefix_len + max_length
        prefill, decode = make_caption_generation_fns(
            self.module, pv, prefix_len, cache_len)
        ids = jnp.full((b, 1), bos_token_id, jnp.int32)
        mask = jnp.ones((b, 1), jnp.int32)
        return generate(prefill, decode, self.params, ids, mask,
                        max_length=max_length, num_beams=num_beams,
                        do_sample=do_sample, top_k=top_k,
                        temperature=temperature, eos_token_id=eos_token_id,
                        pad_token_id=pad_token_id, rng=rng)

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
