"""ControlNet for the latent-diffusion UNet.

Capability parity: reference diffusion/chinese_sd_webui (ControlNet
conditioning for PAI Chinese diffusion models — the webui extension loads a
`Chinese_Controlnet` checkpoint next to the base model and injects its
residuals into the UNet). Re-built TPU-native in flax: a clone of the UNet's
down + middle path whose per-block outputs pass through zero-initialised
1x1 convs and are added onto the UNet's skip connections, so a freshly
initialised ControlNet is an exact no-op and training moves away from the
base model smoothly (Zhang et al., "Adding Conditional Control...", 2023).

The conditioning image ("hint", e.g. canny edges) enters at pixel
resolution and is pulled down 8x to latent resolution by a small conv
ladder whose channel widths (16..256) match the published checkpoints so
`conversion.convert_controlnet` can load them.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from easynlp_tpu.modelzoo.models.latent_diffusion.unet import (
    ResBlock, SpatialTransformer, _gn, timestep_embedding)

# conv ladder of the published checkpoints: stride-2 at every other conv
# pulls the [B, H, W, 3] hint down 8x to the latent grid
HINT_LADDER = ((16, 1), (16, 1), (32, 2), (32, 1),
               (96, 2), (96, 1), (256, 2))


def _hint_ladder(vae_factor):
    """HINT_LADDER with its total stride adapted to the VAE downsample
    factor. Published checkpoints assume factor 8 (three stride-2 convs) and
    get the ladder verbatim; smaller VAEs (tests, custom configs) keep the
    LAST log2(factor) stride-2 positions so the hint lands on the latent
    grid either way."""
    import math
    need = int(math.log2(vae_factor)) if vae_factor > 1 else 0
    stride_positions = [i for i, (_, s) in enumerate(HINT_LADDER) if s == 2]
    if need > len(stride_positions):
        # a negative slice start below would silently keep ONE stride-2 conv
        # and the hint would miss the latent grid with a shape error later
        raise ValueError(
            "VAE downsample factor %d needs %d stride-2 hint convs but the "
            "ladder has %d" % (vae_factor, need, len(stride_positions)))
    keep = set(stride_positions[len(stride_positions) - need:]) if need \
        else set()
    return tuple((w, 2 if i in keep else 1)
                 for i, (w, _) in enumerate(HINT_LADDER))


def edge_hint(images, threshold=0.15):
    """Sobel-edge conditioning map from [B, H, W, 3] images in [-1, 1] —
    the in-framework stand-in for the webui extension's cv2.Canny
    preprocessor (zero-egress image: no opencv; thresholded Sobel gradient
    magnitude is the closest pure-jnp equivalent). Returns [B, H, W, 3]
    binary edges in [0, 1]."""
    gray = jnp.mean((images + 1.0) / 2.0, axis=-1)          # [B, H, W]
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    pad = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="edge")[..., None]
    import jax

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img, k[..., None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    mag = jnp.sqrt(conv(pad, kx) ** 2 + conv(pad, ky) ** 2)
    edges = (mag > threshold).astype(jnp.float32)
    return jnp.repeat(edges[..., None], 3, axis=-1)


class ControlNetModel(nn.Module):
    """Down+middle clone of UNetModel producing control residuals.

    Returns (down_residuals, mid_residual): `down_residuals` aligns 1:1
    with the UNet's `skips` list (same block structure, same shapes), and
    `mid_residual` matches the middle-block output. Shared submodule names
    ("down_%d_res%d", "conv_in", ...) intentionally mirror UNetModel so the
    checkpoint converter reuses the same mapping.
    """

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hint, timesteps, context=None):
        c = self.config
        ch = c.model_channels
        temb = timestep_embedding(timesteps, ch)
        temb = nn.Dense(4 * ch, dtype=jnp.float32, name="temb_dense1")(temb)
        temb = nn.Dense(4 * ch, dtype=jnp.float32, name="temb_dense2")(
            nn.silu(temb))

        # hint ladder: pixel-space conditioning image → latent grid, ch wide;
        # final conv zero-init so an untrained hint contributes nothing
        g = hint.astype(self.dtype)
        ladder = _hint_ladder(2 ** (len(c.vae_channel_mult) - 1))
        for i, (width, stride) in enumerate(ladder):
            g = nn.silu(nn.Conv(width, (3, 3), strides=stride, padding=1,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="hint_conv_%d" % i)(g))
        g = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                    name="hint_conv_out")(g)

        def zero_conv(h, idx):
            return nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           name="zero_conv_%d" % idx)(h)

        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(
            x.astype(self.dtype)) + g
        outs = [zero_conv(h, 0)]
        zi = 1
        for level, mult in enumerate(c.channel_mult):
            out_ch = ch * mult
            for blk in range(c.num_res_blocks):
                h = ResBlock(out_ch, dtype=self.dtype,
                             name="down_%d_res%d" % (level, blk))(h, temb)
                if level in c.attention_levels:
                    h = SpatialTransformer(
                        c.num_heads, dtype=self.dtype,
                        name="down_%d_attn%d" % (level, blk))(h, context)
                outs.append(zero_conv(h, zi))
                zi += 1
            if level < len(c.channel_mult) - 1:
                h = nn.Conv(out_ch, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="down_%d_ds" % level)(h)
                outs.append(zero_conv(h, zi))
                zi += 1

        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res1")(h, temb)
        h = SpatialTransformer(c.num_heads, dtype=self.dtype,
                               name="mid_attn")(h, context)
        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res2")(h, temb)
        mid = nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros, name="mid_out")(h)
        return tuple(outs), mid
