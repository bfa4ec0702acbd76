"""TPU-native latent-diffusion UNet.

Capability parity: reference easynlp/modelzoo/models/latent_diffusion/
openaimodel.py (SD-style UNet: ResBlocks with timestep embedding,
SpatialTransformer cross-attention to text conditioning, down/up sampling)
and attention.py — re-built in flax with NHWC convs (TPU-native layout) and
the shared attention op (Pallas at long sequence lengths).
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.ops.attention import attention


def timestep_embedding(timesteps, dim, max_period=10000.0):
    """Sinusoidal timestep embedding [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _gn(x, name=None):
    groups = 32
    while x.shape[-1] % groups:
        groups //= 2
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)(x)


class ResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        c_in = x.shape[-1]
        h = nn.silu(_gn(x, name="norm1")).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name="temb_proj")(
            nn.silu(temb.astype(jnp.float32)).astype(self.dtype))
        h = h + t[:, None, None, :]
        h = nn.silu(_gn(h, name="norm2")).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="skip")(x)
        return x + h


class SpatialTransformer(nn.Module):
    """Self-attention + cross-attention to text context + gated MLP over the
    flattened spatial grid (reference attention.py BasicTransformerBlock)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, share_self=None, cross_frame=False):
        """share_self (traced bool scalar or None): when true, the SECOND
        half of the batch reuses the FIRST half's self-attention maps —
        the FreeSAP mechanism of FreePromptEditing (reference
        diffusion/FreePromptEditing, CVPR'24): the target-prompt branch
        inherits the source branch's spatial structure.

        cross_frame (static bool): self-attention runs jointly over the
        whole batch-of-frames as ONE sequence (reference
        diffusion/DiffSynth/DiffSynth/attention.py CrossFrameAttention
        'B N D -> 1 (B N) D') — the temporal-coherence mechanism for video
        synthesis."""
        b, hh, ww, c = x.shape
        d = c // self.num_heads
        residual_outer = x
        h = _gn(x, name="norm").astype(self.dtype).reshape(b, hh * ww, c)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_in")(h)

        # self-attention
        normed = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                              name="ln1")(h).astype(self.dtype)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="attn1_qkv")(
            normed).reshape(b, hh * ww, 3, self.num_heads, d)
        if cross_frame:
            # all frames attend to all frames: one joint sequence
            joint = qkv.reshape(1, b * hh * ww, 3, self.num_heads, d)
            ctx = attention(joint[:, :, 0], joint[:, :, 1], joint[:, :, 2])
            ctx = ctx.reshape(b, hh * ww, self.num_heads, d)
        elif share_self is None:
            ctx = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        else:
            # explicit-probs path so the maps can be swapped across the
            # source/target batch halves (editing is inference-time only)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)
            k = qkv[:, :, 1].transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            probs = jax.nn.softmax(
                (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
                / jnp.sqrt(jnp.float32(d)), axis=-1)
            half = b // 2
            shared = jnp.concatenate([probs[:half], probs[:half]], axis=0)
            probs = jnp.where(share_self, shared, probs).astype(v.dtype)
            ctx = (probs @ v).transpose(0, 2, 1, 3)
        h = h + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name="attn1_out")(ctx.reshape(b, hh * ww, c))

        # cross-attention to text
        if context is not None:
            normed = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                  name="ln2")(h).astype(self.dtype)
            q = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="attn2_q")(
                normed).reshape(b, hh * ww, self.num_heads, d)
            kv = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name="attn2_kv")(
                context.astype(self.dtype)).reshape(
                b, context.shape[1], 2, self.num_heads, d)
            ctx = attention(q, kv[:, :, 0], kv[:, :, 1])
            h = h + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                             name="attn2_out")(ctx.reshape(b, hh * ww, c))

        # gated-gelu MLP
        normed = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                              name="ln3")(h).astype(self.dtype)
        g = nn.Dense(8 * c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_in")(normed)
        g1, g2 = jnp.split(g, 2, axis=-1)
        g = nn.gelu(g1, approximate=True) * g2
        h = h + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mlp_out")(g)

        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_out")(h)
        return residual_outer + h.reshape(b, hh, ww, c)


class UNetModel(nn.Module):
    """SD-style UNet. config attrs: model_channels, channel_mult,
    num_res_blocks, attention_levels, num_heads, context_dim, in/out
    channels."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context=None, deterministic=True,
                 share_self=None, cross_frame=False, control=None):
        """control: optional (down_residuals, mid_residual) from
        ControlNetModel — added onto the skip connections and the middle
        output (reference diffusion/chinese_sd_webui ControlNet injection),
        scaled by the caller beforehand if a control strength is wanted."""
        c = self.config
        ch = c.model_channels
        temb = timestep_embedding(timesteps, ch)
        temb = nn.Dense(4 * ch, dtype=jnp.float32, name="temb_dense1")(temb)
        temb = nn.Dense(4 * ch, dtype=jnp.float32, name="temb_dense2")(
            nn.silu(temb))

        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(
            x.astype(self.dtype))
        skips = [h]
        # down path
        for level, mult in enumerate(c.channel_mult):
            out_ch = ch * mult
            for blk in range(c.num_res_blocks):
                h = ResBlock(out_ch, dtype=self.dtype,
                             name="down_%d_res%d" % (level, blk))(h, temb)
                if level in c.attention_levels:
                    h = SpatialTransformer(
                        c.num_heads, dtype=self.dtype,
                        name="down_%d_attn%d" % (level, blk))(
                        h, context, share_self=share_self,
                        cross_frame=cross_frame)
                skips.append(h)
            if level < len(c.channel_mult) - 1:
                h = nn.Conv(out_ch, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="down_%d_ds" % level)(h)
                skips.append(h)

        # middle
        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res1")(h, temb)
        h = SpatialTransformer(c.num_heads, dtype=self.dtype,
                               name="mid_attn")(h, context, share_self=share_self,
                        cross_frame=cross_frame)
        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res2")(h, temb)
        if control is not None:
            down_residuals, mid_residual = control
            assert len(down_residuals) == len(skips), \
                "control residuals misaligned with skip connections"
            skips = [s + r.astype(s.dtype)
                     for s, r in zip(skips, down_residuals)]
            h = h + mid_residual.astype(h.dtype)

        # up path
        for level, mult in reversed(list(enumerate(c.channel_mult))):
            out_ch = ch * mult
            for blk in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(out_ch, dtype=self.dtype,
                             name="up_%d_res%d" % (level, blk))(h, temb)
                if level in c.attention_levels:
                    h = SpatialTransformer(
                        c.num_heads, dtype=self.dtype,
                        name="up_%d_attn%d" % (level, blk))(
                        h, context, share_self=share_self,
                        cross_frame=cross_frame)
            if level > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="up_%d_us" % level)(h)

        h = nn.silu(_gn(h, name="norm_out")).astype(self.dtype)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="conv_out")(h)
