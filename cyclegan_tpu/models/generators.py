"""Generators (reference `arch/generators.py` — SURVEY.md §2 "Generator zoo").

ResNet generator: c7s1-64 -> d128 -> d256 -> R256 x {6|9} -> u128 -> u64 ->
c7s1-out with a tanh head (image generator) or raw logits (label generator —
the training step applies softmax where the continuous class-probability
bridge is needed, SURVEY.md §7 "softmax-label bridge").

U-Net generator: unet_128 / unet_256 recursive skip-connection blocks.

All modules are NHWC, pure (no device logic), with fp32 params and a ``dtype``
compute-precision knob (bf16 on TPU).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclegan_tpu.ops import functional as F
from cyclegan_tpu.ops.blocks import ConvBlock, DeconvBlock, ResidualBlock, get_norm
from cyclegan_tpu.ops.init import conv_kernel_init

Dtype = Any


class ResnetGenerator(nn.Module):
    """CycleGAN ResNet generator (SURVEY.md §3b forward trace)."""

    output_nc: int
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    use_dropout: bool = False
    head: str = "tanh"  # tanh (image domain) | none (label logits)
    remat: bool = False  # rematerialize the residual trunk (jax.checkpoint)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        ngf = self.ngf
        det = deterministic
        # c7s1-64: ReflectionPad(3) + 7x7 conv + IN + ReLU
        h = ConvBlock(ngf, kernel=7, pad=3, pad_mode="reflect", norm=self.norm,
                      act="relu", dtype=self.dtype)(x, deterministic=det)
        # Downsample: 3x3 s2 zero-pad-1 convs, 64->128->256
        h = ConvBlock(ngf * 2, kernel=3, stride=2, pad=1, pad_mode="zero",
                      norm=self.norm, act="relu", dtype=self.dtype)(
                          h, deterministic=det)
        h = ConvBlock(ngf * 4, kernel=3, stride=2, pad=1, pad_mode="zero",
                      norm=self.norm, act="relu", dtype=self.dtype)(
                          h, deterministic=det)
        # Residual trunk — optionally rematerialized: trades a second forward
        # for not keeping 2 activations per block live through the backward
        # (HBM headroom for big crops / global batches).
        block_cls = nn.remat(ResidualBlock, static_argnums=(2,)) if self.remat \
            else ResidualBlock
        for i in range(self.n_blocks):
            # Explicit names keep the param tree identical with remat on/off
            # (nn.remat would otherwise prefix "Checkpoint...").
            h = block_cls(ngf * 4, norm=self.norm, use_dropout=self.use_dropout,
                          dtype=self.dtype,
                          name=f"ResidualBlock_{i}")(h, deterministic)
        # Upsample: transposed 3x3 s2 convs, 256->128->64
        h = DeconvBlock(ngf * 2, norm=self.norm, dtype=self.dtype)(h, det)
        h = DeconvBlock(ngf, norm=self.norm, dtype=self.dtype)(h, det)
        # c7s1-out head
        h = ConvBlock(self.output_nc, kernel=7, pad=3, pad_mode="reflect",
                      norm="none", act="none", dtype=self.dtype)(h)
        if self.head == "tanh":
            h = jnp.tanh(h)
        return h


class _UnetBlock(nn.Module):
    """One U-Net skip-connection level (reference ``UnetSkipConnectionBlock``).

    down: 4x4 s2 conv (LeakyReLU 0.2 before conv on inner levels);
    up: 4x4 s2 transposed conv; outputs concat([x, up(x)]) except at the
    outermost level.
    """

    outer_nc: int
    inner_nc: int
    submodule: Any = None  # nested _UnetBlock or None at innermost
    outermost: bool = False
    innermost: bool = False
    norm: str = "instance"
    use_dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        norm_layer = get_norm(self.norm)

        down_w = self.param("down_kernel", conv_kernel_init(0.02),
                            (4, 4, x.shape[-1], self.inner_nc))
        down_b = self.param("down_bias", nn.initializers.zeros, (self.inner_nc,))

        from cyclegan_tpu.ops.blocks import fused_norm_act

        h = x
        if not self.outermost:
            h = F.leaky_relu(h, 0.2)
        h = F.conv2d(h, down_w, down_b, stride=2, padding=1, compute_dtype=self.dtype)
        if not self.outermost and not self.innermost:
            fused = fused_norm_act(h, self.norm, "none")
            if fused is not None:
                h = fused
            else:
                n = norm_layer()
                if isinstance(n, nn.BatchNorm):
                    h = n(h, use_running_average=deterministic)
                elif n is not None:
                    h = n(h)

        if self.submodule is not None:
            h = self.submodule(h, deterministic=deterministic)

        h = jax.nn.relu(h)
        up_w = self.param("up_kernel", conv_kernel_init(0.02),
                          (4, 4, h.shape[-1], self.outer_nc))
        up_b = self.param("up_bias", nn.initializers.zeros, (self.outer_nc,))
        h = F.conv2d_transpose(h, up_w, up_b, stride=2, padding=1,
                               output_padding=0, compute_dtype=self.dtype)
        if self.outermost:
            return h  # head activation applied by UnetGenerator
        fused = fused_norm_act(h, self.norm, "none")
        if fused is not None:
            h = fused
        else:
            n = norm_layer()
            if isinstance(n, nn.BatchNorm):
                h = n(h, use_running_average=deterministic)
            elif n is not None:
                h = n(h)
        if self.use_dropout:
            h = nn.Dropout(rate=0.5, deterministic=deterministic)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    """U-Net generator (``unet_128`` -> num_downs=7, ``unet_256`` -> 8)."""

    output_nc: int
    num_downs: int = 7
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False
    head: str = "tanh"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        ngf = self.ngf
        # Innermost: ngf*8 <-> ngf*8, no norm at the bottleneck conv.
        block = _UnetBlock(outer_nc=ngf * 8, inner_nc=ngf * 8, innermost=True,
                           norm=self.norm, dtype=self.dtype)
        for _ in range(self.num_downs - 5):
            block = _UnetBlock(outer_nc=ngf * 8, inner_nc=ngf * 8, submodule=block,
                               norm=self.norm, use_dropout=self.use_dropout,
                               dtype=self.dtype)
        block = _UnetBlock(outer_nc=ngf * 4, inner_nc=ngf * 8, submodule=block,
                           norm=self.norm, dtype=self.dtype)
        block = _UnetBlock(outer_nc=ngf * 2, inner_nc=ngf * 4, submodule=block,
                           norm=self.norm, dtype=self.dtype)
        block = _UnetBlock(outer_nc=ngf, inner_nc=ngf * 2, submodule=block,
                           norm=self.norm, dtype=self.dtype)
        block = _UnetBlock(outer_nc=self.output_nc, inner_nc=ngf, submodule=block,
                           outermost=True, norm=self.norm, dtype=self.dtype)
        h = block(x, deterministic=deterministic)
        if self.head == "tanh":
            h = jnp.tanh(h)
        return h


def define_Gen(
    output_nc: int,
    ngf: int = 64,
    netG: str = "resnet_9blocks",
    norm: str = "instance",
    use_dropout: bool = False,
    head: str = "tanh",
    dtype: Dtype = jnp.float32,
    remat: bool = False,
) -> nn.Module:
    """Generator factory (reference ``define_Gen`` — SURVEY.md §2).

    Unlike the reference, returns a pure module: no weight init side effects
    (init happens at ``module.init`` with the N(0,0.02) param initializers),
    no ``.cuda()``/``DataParallel`` (sharding is external). ``input_nc`` is
    inferred from the input at init time (NHWC last axis).
    """
    if netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, n_blocks=9, norm=norm,
                               use_dropout=use_dropout, head=head, dtype=dtype,
                               remat=remat)
    if netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, n_blocks=6, norm=norm,
                               use_dropout=use_dropout, head=head, dtype=dtype,
                               remat=remat)
    if netG == "unet_128":
        return UnetGenerator(output_nc, num_downs=7, ngf=ngf, norm=norm,
                             use_dropout=use_dropout, head=head, dtype=dtype)
    if netG == "unet_256":
        return UnetGenerator(output_nc, num_downs=8, ngf=ngf, norm=norm,
                             use_dropout=use_dropout, head=head, dtype=dtype)
    raise ValueError(f"unknown netG: {netG!r}")
