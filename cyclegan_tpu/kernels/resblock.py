"""Experimental whole-ResidualBlock forward megakernel (docs/KERNELS.md plan).

Computes, entirely in VMEM per batch element:

    y = x + IN( conv3x3( relu( IN( conv3x3( reflect_pad(x) ) + b1 ) ),
                reflect_pad ) + b2 )

i.e. the reference ResidualBlock (SURVEY.md §3b) — two reflect-padded 3x3
convs, two instance norms, inner ReLU, outer residual add — in ONE HBM read
of x and ONE write of y. The XLA pipeline for the same block moves the
activation through ~11 HBM passes (pad materializations, conv outputs, the
IN double-reads); for the ResNet trunk at 64x64x256 every pass is ~2 MB, so
the ceiling is a multi-x bandwidth cut on ~60% of the model's FLOPs.

Convolution strategy: 9 shifted (H·W, C) x (C, C) MXU dot-accumulates over a
VMEM-resident reflect-padded copy — no im2col materialization in HBM.

Status: FORWARD ONLY, experimental — not wired into the models. Training use
requires a Pallas backward (a recompute-style VJP would be slower than the
XLA baseline; see docs/KERNELS.md). Validated against the XLA composition in
interpret mode (tests/test_resblock_kernel.py); hardware A/B pending tunnel
availability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reflect_pad1(x: jax.Array) -> jax.Array:
    """(H, W, C) -> (H+2, W+2, C), torch ReflectionPad2d(1) semantics."""
    x = jnp.concatenate([x[1:2], x, x[-2:-1]], axis=0)
    return jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)


def _conv3x3(xp: jax.Array, w: jax.Array, b: jax.Array, h: int, w_: int,
             c: int) -> jax.Array:
    """9 shifted MXU dots over a padded (H+2, W+2, C) block -> (H*W, C) f32."""
    acc = jnp.zeros((h * w_, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[dy:dy + h, dx:dx + w_, :].reshape(h * w_, c)
            acc = acc + jnp.dot(patch, w[dy, dx],
                                preferred_element_type=jnp.float32)
    return acc + b.astype(jnp.float32)


def _inorm(z: jax.Array, eps: float) -> jax.Array:
    """(H*W, C) f32 instance norm over the spatial axis."""
    mean = jnp.mean(z, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=0, keepdims=True)
    return (z - mean) * jax.lax.rsqrt(var + eps)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, eps):
    x = x_ref[0]
    h, w_, c = x.shape
    dtype = x.dtype
    # conv1 -> IN -> ReLU
    z = _conv3x3(_reflect_pad1(x), w1_ref[...], b1_ref[...], h, w_, c)
    z = jnp.maximum(_inorm(z, eps), 0.0).astype(dtype).reshape(h, w_, c)
    # conv2 -> IN -> +x
    z2 = _conv3x3(_reflect_pad1(z), w2_ref[...], b2_ref[...], h, w_, c)
    y = _inorm(z2, eps).reshape(h, w_, c) + x.astype(jnp.float32)
    out_ref[0] = y.astype(dtype)


def residual_block_fused(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Fused forward ResidualBlock; x: (N, H, W, C), w: (3, 3, C, C)."""
    n, h, w_, c = x.shape
    block = pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n,),
        in_specs=[block, full(w1.shape), full(b1.shape), full(w2.shape),
                  full(b2.shape)],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def residual_block_reference(x, w1, b1, w2, b2, *, eps: float = 1e-5):
    """XLA composition with identical semantics (the A/B baseline)."""
    from cyclegan_tpu.ops import functional as F

    h = F.conv2d(F.reflect_pad(x, 1), w1, b1)
    h = jax.nn.relu(F.instance_norm(h, eps=eps))
    h = F.conv2d(F.reflect_pad(h.astype(x.dtype), 1), w2, b2)
    return x + F.instance_norm(h, eps=eps).astype(x.dtype)


def supported(x_shape: tuple[int, ...], itemsize: int) -> bool:
    """VMEM feasibility: x + padded copy + f32 accum + weights < ~13 MB."""
    if len(x_shape) != 4:
        return False
    _, h, w_, c = x_shape
    need = (h * w_ * c * itemsize            # x block
            + (h + 2) * (w_ + 2) * c * itemsize  # padded copy
            + h * w_ * c * 4                 # f32 accumulator
            + 2 * 9 * c * c * itemsize       # both weights
            + h * w_ * c * itemsize)         # out
    return need <= 13 * 1024 * 1024
