"""VAE (KL autoencoder) for latent diffusion.

Capability parity: reference easynlp/modelzoo/models/latent_diffusion/
autoencoder.py — conv encoder to a diagonal Gaussian latent, conv decoder
back to pixels; SD scaling factor 0.18215 applied by the app.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gn(x, name=None):
    groups = 32
    while x.shape[-1] % groups:
        groups //= 2
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)(x)


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x, name="norm1")).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = nn.silu(_gn(h, name="norm2")).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="skip")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention (reference autoencoder.py
    AttnBlock: GN → 1×1 q/k/v → softmax over the grid → proj_out, residual).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from easynlp_tpu.ops.attention import attention
        b, hh, ww, c = x.shape
        h = _gn(x, name="norm").astype(self.dtype)

        def conv1(name):
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)
        q = conv1("q")(h).reshape(b, hh * ww, 1, c)
        k = conv1("k")(h).reshape(b, hh * ww, 1, c)
        v = conv1("v")(h).reshape(b, hh * ww, 1, c)
        # single "head" of width c over the flattened grid — the shared op
        # takes the flash path at 512-sized grids and up (64×64 latents are
        # a 4096² score matrix the naive einsum would materialise)
        out = attention(q, k, v).reshape(b, hh, ww, c)
        out = conv1("proj_out")(out.astype(self.dtype))
        return x + out


class VAEEncoder(nn.Module):
    """SD/CompVis first-stage encoder layout: per-level res blocks + strided
    downsample, mid = res·attn·res (reference autoencoder.py Encoder)."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        c = self.config
        ch = c.vae_channels
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(
            pixels.astype(self.dtype))
        for level, mult in enumerate(c.vae_channel_mult):
            for blk in range(c.vae_num_res_blocks):
                h = VAEResBlock(ch * mult, dtype=self.dtype,
                                name="down_%d_res%d" % (level, blk))(h)
            if level < len(c.vae_channel_mult) - 1:
                h = nn.Conv(ch * mult, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="down_%d_ds" % level)(h)
        h = VAEResBlock(h.shape[-1], dtype=self.dtype, name="mid_res1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = VAEResBlock(h.shape[-1], dtype=self.dtype, name="mid_res2")(h)
        h = nn.silu(_gn(h, name="norm_out")).astype(self.dtype)
        moments = nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                          dtype=jnp.float32, param_dtype=jnp.float32,
                          name="conv_out")(h)
        # SD applies a 1×1 quant_conv on the moments
        moments = nn.Conv(2 * c.latent_channels, (1, 1), dtype=jnp.float32,
                          param_dtype=jnp.float32, name="quant_conv")(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class VAEDecoder(nn.Module):
    """SD/CompVis decoder: post_quant 1×1 → conv_in → mid res·attn·res →
    (num_res_blocks+1) blocks per level + upsample."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents):
        c = self.config
        ch = c.vae_channels
        mults = list(c.vae_channel_mult)
        h = nn.Conv(c.latent_channels, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="post_quant_conv")(latents)
        h = nn.Conv(ch * mults[-1], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(
            h.astype(self.dtype))
        h = VAEResBlock(h.shape[-1], dtype=self.dtype, name="mid_res1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = VAEResBlock(h.shape[-1], dtype=self.dtype, name="mid_res2")(h)
        for level, mult in reversed(list(enumerate(mults))):
            for blk in range(c.vae_num_res_blocks + 1):
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
