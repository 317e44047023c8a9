"""Pallas weight-gradient kernel for stride-1 3x3 VALID convs (trunk shapes).

Round-2 profile (docs/KERNELS.md): after the fusion fences, the trunk
ResidualBlock BACKWARD still costs ~11 ms/step at 256²b1 — dominated by
XLA's weight-grad convolutions, which it lowers as giant-window convs with
poor MXU shapes at batch 1. The dw computation is really 9 dense dots:

    dw[s, t] = xpad[s:s+H, t:t+W, :]^T  @  dy            # (C, H*W) @ (H*W, C)

— M = N = C (=256 on the trunk), K = H*W (=4096): ideal MXU geometry. This
kernel keeps one batch cell's xpad + dy resident in VMEM and accumulates dw
across the (sequential) batch grid via out-block revisiting, the pattern
proven by kernels/resblock.py's dw kernel.

Used by ops/functional.py::conv2d_valid_dw_fused (custom VJP: XLA forward
and input-grad, Pallas weight-grad). Gated by CYCLEGAN_TPU_DW3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(xp_ref, dy_ref, dw_ref, *, k: int, h: int, w_: int):
    """Grid (k, N) — kernel-row-major so the batch accumulation into each
    dw row happens on CONSECUTIVE grid steps (the out-block persistence
    Pallas TPU guarantees). One kernel ROW of dw per step keeps the
    resident dw block at (1, k, C, C) f32: the full (k, k, C, C) block at
    C=256 blew the 16 MB scoped-vmem limit by 32 KB on v5e."""
    s = pl.program_id(0)
    n_idx = pl.program_id(1)
    dyf = dy_ref[0].reshape(h * w_, dy_ref.shape[-1])

    @pl.when(n_idx == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    slab = xp_ref[0, pl.ds(s, h)]
    for t in range(k):
        patch = slab[:, t:t + w_, :].reshape(h * w_, slab.shape[-1])
        # (C, H*W) @ (H*W, C) on the MXU, f32 accumulation.
        dw_ref[0, t] += jax.lax.dot_general(
            patch, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def conv_dw(xp: jax.Array, dy: jax.Array, k: int = 3,
            interpret: bool = False) -> jax.Array:
    """Weight grad of a VALID stride-1 conv: xp (N, H+k-1, W+k-1, C_in),
    dy (N, H, W, C_out) -> dw (k, k, C_in, C_out) f32."""
    n, hp, wp, cin = xp.shape
    _, h, w_, cout = dy.shape
    return pl.pallas_call(
        functools.partial(_dw_kernel, k=k, h=h, w_=w_),
        grid=(k, n),
        in_specs=[
            pl.BlockSpec((1, hp, wp, cin), lambda s, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_, cout), lambda s, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, cin, cout), lambda s, i: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k, cin, cout), jnp.float32),
        interpret=interpret,
    )(xp, dy)


def supported(xp_shape: tuple[int, ...], dy_shape: tuple[int, ...],
              itemsize: int) -> bool:
    """VMEM feasibility + MXU-worthiness: both channel dims >= 128 (smaller
    dims waste the systolic array and XLA's path is fine there), and the
    resident blocks must fit comfortably."""
    if len(xp_shape) != 4 or len(dy_shape) != 4:
        return False
    _, hp, wp, cin = xp_shape
    _, h, w_, cout = dy_shape
    if cin < 128 or cout < 128:
        return False
    k = hp - h + 1
    need = (hp * wp * cin + h * w_ * cout) * itemsize \
        + k * k * cin * cout * 4 + h * w_ * max(cin, cout) * itemsize
    return need <= 13 * 1024 * 1024
