"""Discriminators (reference `arch/discriminators.py` — SURVEY.md §2).

70x70 PatchGAN: C64 -> C128 -> C256 -> C512 with 4x4 convs (stride 2, last
stride 1), InstanceNorm (none on the first layer), LeakyReLU(0.2), final
1-channel conv, no sigmoid (LSGAN uses raw scores). Plus the 1x1
PixelDiscriminator.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclegan_tpu.ops.blocks import ConvBlock

Dtype = Any


class NLayerDiscriminator(nn.Module):
    """PatchGAN; n_layers=3 gives the 70x70 receptive field."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        det = deterministic
        # First layer: no norm.
        h = ConvBlock(self.ndf, kernel=4, stride=2, pad=1, pad_mode="zero",
                      norm="none", act="leaky", dtype=self.dtype)(x)
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf = min(self.ndf * (2 ** i), self.ndf * 8)
            h = ConvBlock(nf, kernel=4, stride=2, pad=1, pad_mode="zero",
                          norm=self.norm, act="leaky", dtype=self.dtype)(
                              h, deterministic=det)
        # Penultimate: stride 1.
        nf = min(self.ndf * (2 ** self.n_layers), self.ndf * 8)
        h = ConvBlock(nf, kernel=4, stride=1, pad=1, pad_mode="zero",
                      norm=self.norm, act="leaky", dtype=self.dtype)(
                          h, deterministic=det)
        # Final 1-channel score map (no sigmoid — LSGAN).
        h = ConvBlock(1, kernel=4, stride=1, pad=1, pad_mode="zero",
                      norm="none", act="none", dtype=self.dtype)(h)
        return h


class PixelDiscriminator(nn.Module):
    """1x1 per-pixel discriminator."""

    ndf: int = 64
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = ConvBlock(self.ndf, kernel=1, norm="none", act="leaky",
                      dtype=self.dtype)(x)
        h = ConvBlock(self.ndf * 2, kernel=1, norm=self.norm, act="leaky",
                      dtype=self.dtype)(h, deterministic=deterministic)
        h = ConvBlock(1, kernel=1, norm="none", act="none", dtype=self.dtype)(h)
        return h


def define_Dis(
    ndf: int = 64,
    netD: str = "n_layers",
    n_layers_D: int = 3,
    norm: str = "instance",
    dtype: Dtype = jnp.float32,
) -> nn.Module:
    """Discriminator factory (reference ``define_Dis`` — SURVEY.md §2)."""
    if netD in ("n_layers", "basic"):
        n = 3 if netD == "basic" else n_layers_D
        return NLayerDiscriminator(ndf=ndf, n_layers=n, norm=norm, dtype=dtype)
    if netD == "pixel":
        return PixelDiscriminator(ndf=ndf, norm=norm, dtype=dtype)
    raise ValueError(f"unknown netD: {netD!r}")
