"""ARTIST: text → image-token GPT over a VQGAN codebook.

Capability parity: reference easynlp/modelzoo/models/artist/ (GPT over VQGAN
image tokens conditioned on text tokens, reference appzoo/
text2image_generation/model.py:15,333) and the VQ machinery (reference
modelzoo/models/latent_diffusion/quantize.py).

TPU shape: the VQGAN is a conv encoder/decoder around a vector quantiser
(straight-through estimator, codebook + commitment losses); ARTIST itself is
one GPT over the concatenated [text tokens; image tokens] sequence with a
shifted-window LM loss on the image segment; sampling reuses the shared
decoder loop on a static cache.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.configuration_utils import PretrainedConfig
from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config
from easynlp_tpu.modelzoo.models.gpt2.modeling_gpt2 import GPT2Model
from easynlp_tpu.modelzoo.models.latent_diffusion.autoencoder import (
    VAEResBlock,
    _gn,
)
from easynlp_tpu.modelzoo.modeling_utils import BaseModule, truncated_normal_init


class ARTISTConfig(PretrainedConfig):
    model_type = "artist"

    def __init__(self, text_vocab_size=21128, image_vocab_size=1024,
                 image_token_length=256, text_length=32, codebook_dim=64,
                 vq_channels=64, vq_channel_mult=(1, 2, 4),
                 vq_num_res_blocks=1, gpt_config=None, commitment_cost=0.25,
                 **kwargs):
        self.text_vocab_size = text_vocab_size
        self.image_vocab_size = image_vocab_size
        self.image_token_length = image_token_length
        self.text_length = text_length
        self.codebook_dim = codebook_dim
        self.vq_channels = vq_channels
        self.vq_channel_mult = tuple(vq_channel_mult)
        self.vq_num_res_blocks = vq_num_res_blocks
        self.commitment_cost = commitment_cost
        self.gpt_config_dict = gpt_config or {}
        super().__init__(**kwargs)

    @property
    def gpt_config(self):
        d = dict(self.gpt_config_dict)
        d.setdefault("vocab_size",
                     self.text_vocab_size + self.image_vocab_size)
        return GPT2Config(**d)


class VectorQuantizer(nn.Module):
    """VQ with straight-through estimator (reference quantize.py)."""

    num_codes: int
    code_dim: int
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "codebook",
            nn.with_logical_partitioning(
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                ("vocab", "kv")),
            (self.num_codes, self.code_dim), jnp.float32)
        flat = z.reshape(-1, self.code_dim).astype(jnp.float32)
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ codebook.T
             + jnp.sum(codebook ** 2, 1)[None])
        codes = jnp.argmin(d, axis=-1)
        quantised = jnp.take(codebook, codes, axis=0).reshape(z.shape)
        commit = jnp.mean((jax.lax.stop_gradient(quantised) - z) ** 2)
        embed = jnp.mean((quantised - jax.lax.stop_gradient(z)) ** 2)
        vq_loss = embed + self.commitment_cost * commit
        quantised = z + jax.lax.stop_gradient(quantised - z)  # STE
        return quantised, codes.reshape(z.shape[:-1]), vq_loss


class VQGANEncoder(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        c = self.config
        ch = c.vq_channels
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(
            pixels.astype(self.dtype))
        for level, mult in enumerate(c.vq_channel_mult):
            for blk in range(c.vq_num_res_blocks):
                h = VAEResBlock(ch * mult, dtype=self.dtype,
                                name="down_%d_res%d" % (level, blk))(h)
            if level < len(c.vq_channel_mult) - 1:
                h = nn.Conv(ch * mult, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="down_%d_ds" % level)(h)
        h = nn.silu(_gn(h, name="norm_out")).astype(self.dtype)
        return nn.Conv(c.codebook_dim, (1, 1), dtype=jnp.float32,
                       param_dtype=jnp.float32, name="conv_out")(h)


class VQGANDecoder(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, quantised):
        c = self.config
        ch = c.vq_channels
        mults = list(c.vq_channel_mult)
        h = nn.Conv(ch * mults[-1], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(
            quantised.astype(self.dtype))
        for level, mult in reversed(list(enumerate(mults))):
            for blk in range(c.vq_num_res_blocks):
                h = VAEResBlock(ch * mult, dtype=self.dtype,
                                name="up_%d_res%d" % (level, blk))(h)
            if level > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="up_%d_us" % level)(h)
        h = nn.silu(_gn(h, name="norm_out")).astype(self.dtype)
        return nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="conv_out")(h)


class ARTISTModel(BaseModule):
    """text ids + image → GPT logits over the shifted [text; image-code]
    sequence; also exposes tokenize/decode for the VQGAN side.
    image_first=True flips the order to [image-code; text] — the mingpt_i2t
    captioning mirror (reference modelzoo/models/mingpt_i2t)."""

    remat: str = "none"
    image_first: bool = False

    def setup(self):
        c = self.config
        self.vq_encoder = VQGANEncoder(config=c, dtype=self.dtype)
        self.vq_decoder = VQGANDecoder(config=c, dtype=self.dtype)
        self.quantizer = VectorQuantizer(c.image_vocab_size, c.codebook_dim,
                                         c.commitment_cost)
        self.gpt = GPT2Model(config=c.gpt_config, dtype=self.dtype,
                             remat=self.remat)
        self.lm_head = nn.Dense(
            c.gpt_config.vocab_size, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                truncated_normal_init(0.02), ("embed", "vocab")))

    def tokenize_image(self, pixels):
        z = self.vq_encoder(pixels)
        quantised, codes, vq_loss = self.quantizer(z)
        return codes, vq_loss, quantised

    def decode_codes(self, codes):
        c = self.config
        codebook = self.quantizer.variables["params"]["codebook"]
        codebook = jnp.asarray(nn.unbox(codebook))
        quantised = jnp.take(codebook, codes, axis=0)
        return self.vq_decoder(quantised)

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

    def lm_step(self, input_ids, attention_mask=None, position_ids=None,
                cache=None):
        """GPT + LM head over raw joint-vocab ids (prefill/decode path for
        image-code sampling — reference text2image_generation/model.py:333's
        generate loop, here as a static-cache decode step)."""
        out = self.gpt(input_ids=input_ids, attention_mask=attention_mask,
                       position_ids=position_ids, cache=cache,
                       deterministic=True)
        result = {"logits": self.lm_head(out["last_hidden_state"])}
        if "cache" in out:
            result["cache"] = out["cache"]
        return result

    def __call__(self, input_ids, pixel_values=None, image_codes=None,
                 attention_mask=None, deterministic=True):
        c = self.config
        vq_loss = jnp.zeros((), jnp.float32)
        recon = None
        if image_codes is None:
            image_codes, vq_loss, quantised = self.tokenize_image(pixel_values)
            image_codes = image_codes.reshape(input_ids.shape[0], -1)
            recon = self.vq_decoder(quantised)
            vq_loss = vq_loss + jnp.mean(
                (recon.astype(jnp.float32)
                 - pixel_values.astype(jnp.float32)) ** 2)
        # image codes live in [text_vocab, text_vocab + image_vocab)
        text_mask = attention_mask if attention_mask is not None \
            else jnp.ones(input_ids.shape, jnp.int32)
        img_mask = jnp.ones(image_codes.shape, jnp.int32)
        if self.image_first:
            seq = jnp.concatenate(
                [image_codes + c.text_vocab_size, input_ids], axis=1)
            mask = jnp.concatenate([img_mask, text_mask], axis=1)
        else:
            seq = jnp.concatenate(
                [input_ids, image_codes + c.text_vocab_size], axis=1)
            mask = jnp.concatenate([text_mask, img_mask], axis=1)
        out = self.gpt(input_ids=seq, attention_mask=mask,
                       deterministic=deterministic)
        logits = self.lm_head(out["last_hidden_state"])
        out_dict = {"logits": logits, "sequence": seq, "vq_loss": vq_loss,
                    "image_codes": image_codes}
        if recon is not None:
            out_dict["reconstruction"] = recon
        return out_dict
