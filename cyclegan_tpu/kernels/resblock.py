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


def _forward_pallas(x, w1, b1, w2, b2, eps, interpret):
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


def _fold_pad1(gp: jax.Array) -> jax.Array:
    """VJP of _reflect_pad1: fold the pad rows/cols back onto their sources
    (cols first — it was the outer pad — then rows). Uses static zero-pads
    instead of .at[].add (no scatter on TPU Pallas)."""
    hp, wp, _ = gp.shape
    w_ = wp - 2
    g = gp[:, 1:-1, :]
    g = g + jnp.pad(gp[:, 0:1, :], ((0, 0), (1, w_ - 2), (0, 0)))
    g = g + jnp.pad(gp[:, -1:, :], ((0, 0), (w_ - 2, 1), (0, 0)))
    h = hp - 2
    g2 = g[1:-1]
    g2 = g2 + jnp.pad(g[0:1], ((1, h - 2), (0, 0), (0, 0)))
    g2 = g2 + jnp.pad(g[-1:], ((h - 2, 1), (0, 0), (0, 0)))
    return g2


def _in_vjp(g, zhat, rstd):
    """d/dz of instance norm given zhat=(z-mu)*rstd: all (HW, C) f32."""
    g_mean = jnp.mean(g, axis=0, keepdims=True)
    gz_mean = jnp.mean(g * zhat, axis=0, keepdims=True)
    return rstd * (g - g_mean - zhat * gz_mean)


def _conv3x3_wgrad(inp_padded, g3, h, w_, c):
    """dw[dy,dx] = patch(dy,dx)^T @ g; returns (3, 3, C, C) f32."""
    rows = []
    for dy in range(3):
        cols = []
        for dx in range(3):
            patch = inp_padded[dy:dy + h, dx:dx + w_, :].reshape(h * w_, c)
            cols.append(jax.lax.dot_general(
                patch, g3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _conv3x3_igrad(g3hw, w, h, w_, c):
    """Input grad of the padded tensor: sum of 9 shifted dots with w[dy,dx]^T,
    each placed via a static zero-pad (Mosaic has no scatter-add; .at[].add
    on slices fails to lower on TPU). Returns (H+2, W+2, C) f32."""
    dpad = jnp.zeros((h + 2, w_ + 2, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            contrib = jnp.dot(g3hw, w[dy, dx].T.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            dpad = dpad + jnp.pad(
                contrib.reshape(h, w_, c),
                ((dy, 2 - dy), (dx, 2 - dx), (0, 0)))
    return dpad


def _recompute_fwd(x, w1, b1, w2, b2, eps):
    """Recompute the forward intermediates from VMEM-resident x."""
    h, w_, c = x.shape
    xp = _reflect_pad1(x)
    u = _conv3x3(xp, w1, b1, h, w_, c)
    mu1 = jnp.mean(u, axis=0, keepdims=True)
    r1 = jax.lax.rsqrt(jnp.mean(jnp.square(u - mu1), axis=0, keepdims=True) + eps)
    vhat = (u - mu1) * r1
    a = jnp.maximum(vhat, 0.0).astype(x.dtype).reshape(h, w_, c)
    ap = _reflect_pad1(a)
    s = _conv3x3(ap, w2, b2, h, w_, c)
    mu2 = jnp.mean(s, axis=0, keepdims=True)
    r2 = jax.lax.rsqrt(jnp.mean(jnp.square(s - mu2), axis=0, keepdims=True) + eps)
    shat = (s - mu2) * r2
    return xp, vhat, r1, ap, shat, r2


def _du_chain(dy, vhat, r1, shat, r2, w2, h, w_, c):
    """dy -> ds (through IN2) and ds -> du (conv2 input grad, ReLU, IN1)."""
    ds = _in_vjp(dy, shat, r2)
    da = _fold_pad1(_conv3x3_igrad(ds, w2, h, w_, c))
    dv = da.reshape(h * w_, c) * (vhat > 0)
    du = _in_vjp(dv, vhat, r1)
    return ds, du


# The backward is SPLIT into a dx kernel and a dw kernel: one fused kernel
# holding the recompute, both weight-grad dot sets and both input-grad pad
# buffers needed ~19.3 MB of Mosaic stack at the 128-crop trunk shape and
# OOMed the 16 MB VMEM (measured on v5e). Each half re-reads x/dy — still
# far below XLA's per-op traffic.


def _bwd_dx_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref, dx_ref,
                   *, eps):
    x = x_ref[0]
    h, w_, c = x.shape
    dy = dy_ref[0].astype(jnp.float32).reshape(h * w_, c)
    w1, w2 = w1_ref[...], w2_ref[...]
    _, vhat, r1, _, shat, r2 = _recompute_fwd(x, w1, b1_ref[...], w2,
                                              b2_ref[...], eps)
    _, du = _du_chain(dy, vhat, r1, shat, r2, w2, h, w_, c)
    dxc = _fold_pad1(_conv3x3_igrad(du, w1, h, w_, c))
    dx_ref[0] = (dy.reshape(h, w_, c) + dxc).astype(dx_ref.dtype)


def _bwd_dw_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   dw1_ref, dw2_ref, *, eps):
    i = pl.program_id(0)
    x = x_ref[0]
    h, w_, c = x.shape
    dy = dy_ref[0].astype(jnp.float32).reshape(h * w_, c)
    w1, w2 = w1_ref[...], w2_ref[...]
    xp, vhat, r1, ap, shat, r2 = _recompute_fwd(x, w1, b1_ref[...], w2,
                                                b2_ref[...], eps)
    ds, du = _du_chain(dy, vhat, r1, shat, r2, w2, h, w_, c)
    dw2 = _conv3x3_wgrad(ap, ds, h, w_, c)
    dw1 = _conv3x3_wgrad(xp, du, h, w_, c)

    # dw accumulation across the (sequential) batch grid.
    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    dw1_ref[...] += dw1
    dw2_ref[...] += dw2


def _backward_pallas(x, dy, w1, b1, w2, b2, eps, interpret):
    n, h, w_, c = x.shape
    block = pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [block, block, full(w1.shape), full(b1.shape),
                full(w2.shape), full(b2.shape)]
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, eps=eps),
        grid=(n,),
        in_specs=in_specs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, dy, w1, b1, w2, b2)
    dw1, dw2 = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, eps=eps),
        grid=(n,),
        in_specs=in_specs,
        out_specs=(full(w1.shape), full(w2.shape)),
        out_shape=(
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(x, dy, w1, b1, w2, b2)
    return dx, dw1, dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def residual_block_fused(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Fused ResidualBlock; x: (N, H, W, C), w: (3, 3, C, C).

    Differentiable: the VJP is a single fused Pallas backward per batch cell
    (recompute-in-VMEM; dx + both dw in one pass). Bias grads are exactly
    zero — a per-channel constant added before instance norm cancels in the
    mean subtraction (true of the reference's conv-bias-before-IN too).
    """
    return _forward_pallas(x, w1, b1, w2, b2, eps, interpret)


def _rb_fwd(x, w1, b1, w2, b2, eps, interpret):
    y = _forward_pallas(x, w1, b1, w2, b2, eps, interpret)
    return y, (x, w1, b1, w2, b2)


def _rb_bwd(eps, interpret, res, dy):
    x, w1, b1, w2, b2 = res
    dx, dw1, dw2 = _backward_pallas(x, dy, w1, b1, w2, b2, eps, interpret)
    return (dx, dw1.astype(w1.dtype), jnp.zeros_like(b1),
            dw2.astype(w2.dtype), jnp.zeros_like(b2))


residual_block_fused.defvjp(_rb_fwd, _rb_bwd)


def residual_block_reference(x, w1, b1, w2, b2, *, eps: float = 1e-5):
    """XLA composition with identical semantics (the A/B baseline)."""
    from cyclegan_tpu.ops import functional as F

    h = F.conv2d(F.reflect_pad(x, 1), w1, b1)
    h = jax.nn.relu(F.instance_norm(h, eps=eps))
    h = F.conv2d(F.reflect_pad(h.astype(x.dtype), 1), w2, b2)
    return x + F.instance_norm(h, eps=eps).astype(x.dtype)


def supported(x_shape: tuple[int, ...], itemsize: int) -> bool:
    """VMEM feasibility, calibrated on hardware: Mosaic's measured stack for
    this kernel is ~10 activation planes (x, two padded copies, f32 accums,
    relu intermediate, out, double-buffering) + both weights. The (64,64,256)
    bf16 plane (2.1 MB) needed 20.2 MB and OOMed the 16 MB VMEM; (32,32,256)
    fits — i.e. the ResNet trunk is fusable at 128x128 crops, not 256x256."""
    if len(x_shape) != 4:
        return False
    _, h, w_, c = x_shape
    plane = h * w_ * c
    need = 8 * plane * itemsize + 2 * plane * 4 + 2 * 9 * c * c * itemsize
    return need <= 15 * 1024 * 1024
