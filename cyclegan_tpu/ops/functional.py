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


def _reflect_pad_concat(x: jax.Array, pad: int) -> jax.Array:
    """Reflection pad built from flip+slice+concat (identical values to
    :func:`reflect_pad`). Used on the GEMM conv path because every op here
    has a scatter-free transpose: autodiff turns it into slices and adds,
    where ``jnp.pad(mode="reflect")``'s VJP can lower to a TPU-hostile
    scatter."""
    if pad == 0:
        return x
    top = jnp.flip(x[:, 1:pad + 1], axis=1)
    bot = jnp.flip(x[:, -pad - 1:-1], axis=1)
    x = jnp.concatenate([top, x, bot], axis=1)
    left = jnp.flip(x[:, :, 1:pad + 1], axis=2)
    right = jnp.flip(x[:, :, -pad - 1:-1], axis=2)
    return jnp.concatenate([left, x, right], axis=2)


def _unfold_flat(xp: jax.Array, k: int, h: int, w_: int) -> jax.Array:
    """(N, H+k-1, W+k-1, C) -> (N*h*w_, k*k*C); channel order (dy, dx, c)
    matches ``w.reshape(k*k*C, -1)``."""
    n, c = xp.shape[0], xp.shape[-1]
    patches = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w_, :] for dy in range(k) for dx in range(k)],
        axis=-1)
    return patches.reshape(n * h * w_, k * k * c)


@jax.custom_vjp
def _conv_gemm_core(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 'same' reflect-pad conv as an im2col GEMM (no bias)."""
    k = w.shape[0]
    n, h, w_, cin = x.shape
    patches = _unfold_flat(_reflect_pad_concat(x, (k - 1) // 2), k, h, w_)
    return lax.dot_general(
        patches, w.reshape(k * k * cin, -1), (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    ).reshape(n, h, w_, w.shape[-1])


def _conv_gemm_fwd(x, w):
    return _conv_gemm_core(x, w), (x, w)


def _conv_gemm_bwd(res, dy):
    """Memory-shaped transposes (the autodiff'd unfold would materialize a
    (N*H*W, k*k*C) cotangent — 411 MB for the 256² stem):

    - dw: recomputed patches^T @ dy — one GEMM with contraction N*H*W.
    - d(padded x): whichever of the two equivalent forms materializes less —
      im2col on dy (k*k*Cout channels) when Cout <= Cin, else k*k small
      (K=Cout) dots placed by static zero-pads.
    - reflect-pad transpose via jax.vjp of the concat/flip construction
      (slices + adds; no scatter).
    """
    x, w = res
    k = w.shape[0]
    p = (k - 1) // 2
    n, h, w_, cin = x.shape
    cout = w.shape[-1]
    dyf = dy.reshape(n * h * w_, cout)

    patches = _unfold_flat(_reflect_pad_concat(x, p), k, h, w_)
    dw = lax.dot_general(patches, dyf, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dw = dw.reshape(k, k, cin, cout).astype(w.dtype)

    hp, wp = h + 2 * p, w_ + 2 * p
    if cout <= cin:
        # Transposed conv as one im2col GEMM over dy (full zero pad k-1).
        dyp = jnp.pad(dy, ((0, 0), (k - 1, k - 1), (k - 1, k - 1), (0, 0)))
        dpat = _unfold_flat(dyp, k, hp, wp)
        wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).reshape(k * k * cout, cin)
        dxp = lax.dot_general(dpat, wt, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        dxp = dxp.reshape(n, hp, wp, cin)
    else:
        dxp = jnp.zeros((n, hp, wp, cin), jnp.float32)
        for s in range(k):
            for t in range(k):
                contrib = lax.dot_general(
                    dyf, w[s, t], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(n, h, w_, cin)
                dxp = dxp + jnp.pad(
                    contrib, ((0, 0), (s, 2 * p - s), (t, 2 * p - t), (0, 0)))

    _, pad_vjp = jax.vjp(
        lambda t: _reflect_pad_concat(t, p), jnp.zeros(x.shape, dxp.dtype))
    dx = pad_vjp(dxp)[0].astype(x.dtype)
    return dx, dw


_conv_gemm_core.defvjp(_conv_gemm_fwd, _conv_gemm_bwd)


@jax.custom_vjp
def _gemm_fwd_xla_bwd_core(x: jax.Array, w: jax.Array) -> jax.Array:
    """im2col-GEMM FORWARD with XLA's own conv backward.

    The GEMM forward turns the lane-starved 7x7 stem/head convs into one
    MXU-deep dot; the backward stays exactly what XLA autodiff would build
    for the plain reflect-pad conv (its fused dx/dw/optimizer chains beat
    every hand-written alternative tried this round — docs/KERNELS.md
    ledger). Gated by CYCLEGAN_TPU_CONV7=fwdgemm."""
    return _conv_gemm_core(x, w)


def _gfxb_fwd(x, w):
    k = w.shape[0]

    def plain(x, w):
        xp = reflect_pad(x, (k - 1) // 2)
        return lax.conv_general_dilated(
            xp, w, (1, 1), "VALID", dimension_numbers=_DIMS,
            preferred_element_type=x.dtype)

    _, vjp = jax.vjp(plain, x, w)
    return _conv_gemm_core(x, w), vjp


def _gfxb_bwd(vjp, dy):
    return vjp(dy)


_gemm_fwd_xla_bwd_core.defvjp(_gfxb_fwd, _gfxb_bwd)


def conv2d_reflect_gemm(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    compute_dtype: jnp.dtype | None = None,
    bwd: str = "gemm",
) -> jax.Array:
    """Stride-1 'same' reflect-pad conv as an explicit im2col GEMM.

    Motivation (round-2 TPU profile, docs/KERNELS.md): the generator's 7x7
    stem/head convs have 3/21/64 channels — XLA's native conv path contracts
    over the tiny channel dim (3..64 of the MXU's 128 lanes) and pads the
    21-channel tensors through layout copies; these four convs measured ~36%
    of the whole semi-sup train step at 256x256. Unfolding the k*k window
    into the channel axis makes the contraction k*k*C_in (147/1029/3136) —
    full MXU depth. The backward is a custom VJP with memory-shaped
    transposes (see :func:`_conv_gemm_bwd`).

    Requires odd kernel with 2*pad == k-1 (the generator's c7s1 geometry).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    core = _conv_gemm_core if bwd == "gemm" else _gemm_fwd_xla_bwd_core
    out = core(x, w)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


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


@jax.custom_vjp
def conv2d_valid_dw_fused(xp: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 VALID conv whose VJP computes the weight grad with the
    Pallas kernel in :mod:`cyclegan_tpu.kernels.conv_dw` (the trunk-shape
    dw conv is XLA's weak spot at batch 1 — docs/KERNELS.md round-2).

    Forward and input-grad stay on XLA's conv path (they are fine there);
    only dw is replaced. Callers gate via :func:`use_dw_fused`.
    """
    return lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=_DIMS,
        preferred_element_type=xp.dtype)


def _dwf_fwd(xp, w):
    return conv2d_valid_dw_fused(xp, w), (xp, w)


def _dwf_bwd(res, dy):
    xp, w = res
    k = w.shape[0]
    # dxp: standard transposed conv — full zero pad + rot180, channels
    # swapped. Same XLA path autodiff would pick.
    dyp = jnp.pad(dy, ((0, 0), (k - 1, k - 1), (k - 1, k - 1), (0, 0)))
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    dxp = lax.conv_general_dilated(
        dyp, wt.astype(dy.dtype), (1, 1), "VALID", dimension_numbers=_DIMS,
        preferred_element_type=dy.dtype)
    from cyclegan_tpu.kernels.conv_dw import conv_dw

    interpret = jax.default_backend() != "tpu"
    dw = conv_dw(xp, dy, k, interpret=interpret).astype(w.dtype)
    return dxp, dw


conv2d_valid_dw_fused.defvjp(_dwf_fwd, _dwf_bwd)


def use_dw_fused(xp_shape, out_ch: int, kernel: int, stride, itemsize: int) -> bool:
    """Routing predicate for :func:`conv2d_valid_dw_fused` (the
    CYCLEGAN_TPU_DW3 gate lives at the ConvBlock level)."""
    if kernel != 3 or stride not in (1, (1, 1)):
        return False
    from cyclegan_tpu.kernels.conv_dw import supported

    n, hp, wp, cin = xp_shape
    return supported(xp_shape, (n, hp - 2, wp - 2, out_ch), itemsize)


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
