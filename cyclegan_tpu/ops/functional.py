"""Functional NN primitives, NHWC, TPU-first.

These are the XLA-lowered equivalents of the reference's torch ops
(SURVEY.md §2 "Op blocks": reflect-pad conv, transposed conv, instance norm).
Geometry conventions are chosen to match torch semantics exactly so the
torch-CPU parity tests in tests/test_ops_parity.py can assert bitwise-close
outputs; layout is NHWC / HWIO (TPU-native), *not* torch's NCHW / OIHW.

All functions are pure and jit-safe (static shapes, no Python control flow on
traced values).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels — XLA's preferred TPU conv layout.
_DIMS = ("NHWC", "HWIO", "NHWC")


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """Reflection-pad spatial dims of an NHWC tensor.

    Matches ``torch.nn.ReflectionPad2d(pad)`` edge semantics (edge pixel not
    repeated).
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 1,
    padding: int | str | Sequence[tuple[int, int]] = 0,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``padding`` as an int means symmetric zero-pad (torch ``Conv2d(padding=p)``).
    When ``compute_dtype`` is given (e.g. bf16), inputs are cast for the MXU and
    the result is accumulated in fp32 (``preferred_element_type``).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # Output dtype matches the inputs (bf16 under mixed precision — the MXU
    # still accumulates bf16 matmuls in fp32 internally). Mixing bf16 inputs
    # with a f32 preferred_element_type breaks the conv VJP (dtype-mismatched
    # cotangents), so precision recovery happens in the loss/norm layers
    # instead.
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=padding,
        dimension_numbers=_DIMS,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_transpose(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Transposed 2-D convolution with torch ``ConvTranspose2d`` geometry.

    Output spatial size = (in - 1) * stride - 2 * padding + k + output_padding.
    With the reference's (k=3, s=2, p=1, op=1) this doubles H and W
    (SURVEY.md §3b "upsample").

    Implemented as an input-dilated regular convolution (``lhs_dilation``) with a
    spatially flipped kernel — the form XLA tiles onto the MXU directly, instead
    of a scatter-based deconv. ``w`` is HWIO with I = input channels of ``x``
    (i.e. already transposed relative to torch's (I, O, kH, kW) layout; the
    parity test handles the torch->jax weight permutation).
    """
    kh, kw = w.shape[0], w.shape[1]
    # Equivalent dilated-conv padding for torch transposed-conv geometry:
    # lo = k - 1 - p, hi = k - 1 - p + output_padding.
    pad = (
        (kh - 1 - padding, kh - 1 - padding + output_padding),
        (kw - 1 - padding, kw - 1 - padding + output_padding),
    )
    w_flipped = jnp.flip(w, axis=(0, 1))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_flipped = w_flipped.astype(compute_dtype)
    out = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def instance_norm(
    x: jax.Array,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """Instance normalization over spatial dims of an NHWC tensor.

    Matches ``torch.nn.InstanceNorm2d`` defaults: biased variance, eps=1e-5,
    no running stats; affine only when scale/bias given (reference default is
    affine=False — SURVEY.md §2 "norm-layer selector (instance default)").

    Statistics are always taken in fp32 for numerical stability under bf16
    compute; the result is cast back to the input dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """LeakyReLU with the reference's 0.2 slope (PatchGAN — SURVEY.md §2)."""
    return jnp.where(x >= 0, x, x * negative_slope)
