"""Fused instance-norm (+ activation, + residual add) Pallas TPU kernel.

Computes, per (sample, channel) over the spatial axes:
    y = act((x - mean) * rsqrt(var + eps)) [+ skip]
in a single VMEM-resident pass per (sample, channel-tile) grid cell — one HBM
read of x and one write of y, vs. XLA's reduce-then-normalize which reads x
twice. The backward pass is likewise one fused kernel implementing the
instance-norm VJP:
    dx = rstd * (g - mean_hw(g) - xhat * mean_hw(g * xhat)),  g = act'(dy)

Stats are computed in fp32 regardless of input dtype (matches
ops.functional.instance_norm semantics: biased variance, eps inside rsqrt,
torch InstanceNorm2d defaults). Activation: none | relu | leaky(0.2).
Residual add (`skip`) fuses the ResidualBlock tail `x + IN(conv(h))`.

Falls back to pure-XLA ops (ops.functional) for shapes whose spatial plane
doesn't fit VMEM; used via ops.blocks when CYCLEGAN_TPU_PALLAS is enabled.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block VMEM budget for the x block (bytes). The ~16 MB VMEM must also
# hold the out block; 6 MB keeps the ResNet trunk and the 128x128x128 bf16
# upsample level fused (the 256x256x64 stem falls back to XLA — its full
# spatial plane cannot sit in VMEM, and a two-pass Pallas kernel would match
# XLA's 2-read traffic anyway).
_VMEM_BUDGET = 6 * 1024 * 1024

_LEAKY_SLOPE = 0.2


def _choose_c_tile(hw: int, c: int, itemsize: int) -> int:
    """Largest channel tile (multiple of 128 when possible) fitting budget."""
    if c <= 128:
        return c
    tile = c
    while tile > 128 and hw * tile * itemsize > _VMEM_BUDGET:
        tile //= 2
    return tile


def _act_fwd(z, act: str):
    if act == "relu":
        return jnp.maximum(z, 0.0)
    if act == "leaky":
        return jnp.where(z >= 0, z, z * _LEAKY_SLOPE)
    return z


def _act_grad_from_z(z, act: str):
    if act == "relu":
        return (z > 0).astype(z.dtype)
    if act == "leaky":
        return jnp.where(z >= 0, 1.0, _LEAKY_SLOPE).astype(z.dtype)
    return jnp.ones_like(z)


def _fwd_kernel(x_ref, out_ref, mean_ref, rstd_ref, *, eps, act, has_skip,
                skip_ref=None):
    # x block: (1, HW, Ct). Stats in fp32 over the HW axis.
    x = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    z = (x - mean) * rstd
    y = _act_fwd(z, act)
    if has_skip:
        y = y + skip_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)
    # stats blocks are (1, 1, ct) — TPU tiling needs the sublane dim to match
    # the (n, 1, c)-shaped stats array, not a (n, c) one
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _fwd_kernel_skip(x_ref, skip_ref, out_ref, mean_ref, rstd_ref, *, eps, act):
    _fwd_kernel(x_ref, out_ref, mean_ref, rstd_ref, eps=eps, act=act,
                has_skip=True, skip_ref=skip_ref)


def _bwd_kernel(x_ref, dy_ref, mean_ref, rstd_ref, dx_ref, *, act):
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    mean = mean_ref[0]  # (1, ct)
    rstd = rstd_ref[0]
    xhat = (x - mean) * rstd
    g = dy * _act_grad_from_z(xhat, act)
    g_mean = jnp.mean(g, axis=0, keepdims=True)
    gx_mean = jnp.mean(g * xhat, axis=0, keepdims=True)
    dx_ref[0] = (rstd * (g - g_mean - xhat * gx_mean)).astype(dx_ref.dtype)


def _pallas_fwd(x, skip, *, eps: float, act: str, interpret: bool):
    n, h, w, c = x.shape
    hw = h * w
    ct = _choose_c_tile(hw, c, x.dtype.itemsize)
    assert c % ct == 0
    x3 = x.reshape(n, hw, c)
    grid = (n, c // ct)
    block = pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    stat_block = pl.BlockSpec((1, 1, ct), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
    )
    if skip is None:
        kernel = functools.partial(_fwd_kernel, eps=eps, act=act,
                                   has_skip=False)
        in_specs = [block]
        args = (x3,)
    else:
        kernel = functools.partial(_fwd_kernel_skip, eps=eps, act=act)
        in_specs = [block, block]
        args = (x3, skip.reshape(n, hw, c))
    y, mean, rstd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(block, stat_block, stat_block),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return y.reshape(n, h, w, c), mean, rstd


def _pallas_bwd(x, dy, mean, rstd, *, act: str, interpret: bool):
    n, h, w, c = x.shape
    hw = h * w
    ct = _choose_c_tile(hw, c, max(x.dtype.itemsize, dy.dtype.itemsize))
    grid = (n, c // ct)
    block = pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    stat_block = pl.BlockSpec((1, 1, ct), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act),
        grid=grid,
        in_specs=[block, block, stat_block, stat_block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(x.reshape(n, hw, c), dy.reshape(n, hw, c), mean, rstd)
    return dx.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def instance_norm_act(
    x: jax.Array,
    skip: Optional[jax.Array],
    eps: float = 1e-5,
    act: str = "none",
    interpret: bool = False,
) -> jax.Array:
    """Fused instance-norm + activation (+ residual add).

    ``skip``: optional tensor added AFTER norm+act (ResidualBlock tail).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU CI).
    """
    y, _, _ = _pallas_fwd(x, skip, eps=eps, act=act, interpret=interpret)
    return y


def _vjp_fwd(x, skip, eps, act, interpret):
    y, mean, rstd = _pallas_fwd(x, skip, eps=eps, act=act, interpret=interpret)
    return y, (x, mean, rstd, skip is not None)


def _vjp_bwd(eps, act, interpret, res, dy):
    x, mean, rstd, had_skip = res
    dx = _pallas_bwd(x, dy, mean, rstd, act=act, interpret=interpret)
    dskip = dy if had_skip else None
    return dx, dskip


instance_norm_act.defvjp(_vjp_fwd, _vjp_bwd)


def supported_shape(x_shape: tuple[int, ...], itemsize: int) -> bool:
    """True if (N,H,W,C) can be tiled into VMEM by this kernel."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    hw = h * w
    ct = _choose_c_tile(hw, c, itemsize)
    return c % ct == 0 and hw * ct * itemsize <= _VMEM_BUDGET
