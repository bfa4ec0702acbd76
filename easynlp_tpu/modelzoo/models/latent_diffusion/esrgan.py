"""ESRGAN 4× super-resolution stage (RRDBNet).

Capability parity: reference easynlp/modelzoo/models/latent_diffusion/
RRDBNet_arch.py — residual-in-residual dense blocks + 2× nearest-upsample
twice. TPU shape: NHWC convs, scan over the RRDB trunk (params carry a
'stack' axis — nb identical blocks compile once), fused leaky-relu."""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv(features, name, dtype):
    return nn.Conv(features, (3, 3), padding=1, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class ResidualDenseBlock(nn.Module):
    nf: int
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = _lrelu(_conv(self.gc, "conv1", self.dtype)(x))
        x2 = _lrelu(_conv(self.gc, "conv2", self.dtype)(
            jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(_conv(self.gc, "conv3", self.dtype)(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(_conv(self.gc, "conv4", self.dtype)(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _conv(self.nf, "conv5", self.dtype)(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (scan body: carry = features)."""

    nf: int
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        out = ResidualDenseBlock(self.nf, self.gc, self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock(self.nf, self.gc, self.dtype,
                                 name="rdb2")(out)
        out = ResidualDenseBlock(self.nf, self.gc, self.dtype,
                                 name="rdb3")(out)
        return out * 0.2 + x, None


class RRDBNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fea = _conv(self.nf, "conv_first", self.dtype)(x.astype(self.dtype))
        scan = nn.scan(RRDB, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=self.nb,
                       metadata_params={nn.PARTITION_NAME: "stack"})
        trunk, _ = scan(nf=self.nf, gc=self.gc, dtype=self.dtype,
                        name="trunk")(fea)
        fea = fea + _conv(self.nf, "trunk_conv", self.dtype)(trunk)

        for name in ("upconv1", "upconv2"):
            b, h, w, c = fea.shape
            fea = jax.image.resize(fea, (b, h * 2, w * 2, c), "nearest")
            fea = _lrelu(_conv(self.nf, name, self.dtype)(fea))
        out = _conv(self.nf, "HRconv", self.dtype)(fea)
        return _conv(self.out_nc, "conv_last", jnp.float32)(_lrelu(out))


def convert_rrdbnet(state_dict, nb=23):
    """Reference/ESRGAN torch checkpoint → RRDBNet params (OIHW → HWIO, the
    trunk stacked on the scan axis)."""
    s = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(key):
        return {"kernel": s[key + ".weight"].transpose(2, 3, 1, 0),
                "bias": s[key + ".bias"]}

    def stack(fn):
        per = [fn(i) for i in range(nb)]

        def merge(trees):
            out = {}
            for k in trees[0]:
                if isinstance(trees[0][k], dict):
                    out[k] = merge([t[k] for t in trees])
                else:
                    out[k] = np.stack([t[k] for t in trees])
            return out
        return merge(per)

    def rrdb(i):
        out = {}
        for j in (1, 2, 3):
            base = "RRDB_trunk.%d.RDB%d." % (i, j)
            out["rdb%d" % j] = {"conv%d" % k: conv(base + "conv%d" % k)
                                for k in range(1, 6)}
        return out

    return {
        "conv_first": conv("conv_first"),
        "trunk": stack(rrdb),
        "trunk_conv": conv("trunk_conv"),
        "upconv1": conv("upconv1"),
        "upconv2": conv("upconv2"),
        "HRconv": conv("HRconv"),
        "conv_last": conv("conv_last"),
    }
