"""Spatially-chunked whole-ResidualBlock kernel — the round-3 candidate
(VERDICT r2 item 1; docs/KERNELS.md "What would actually win").

The round-2 megakernel (kernels/resblock.py) holds the full (H, W, C)
activation plane in VMEM, which caps it at 128-crop trunk shapes; the 256²
trunk plane (64, 64, 256) needs ~20 MB of Mosaic stack and OOMs the 16 MB
VMEM. This variant tiles the plane into K row-chunks with a 1-row halo,
streamed through VMEM by explicit DMA from HBM (``memory_space=ANY`` refs +
``pltpu.make_async_copy``), so any trunk shape fits.

Instance-norm statistics are global over (H, W), so one grid pass cannot
normalize: the grid is (N, 3 phases, K chunks), phases sequential per batch
element (TPU grids execute in order; VMEM scratch persists across steps):

  P0: x chunk+halo --DMA--> VMEM; u = conv1(reflect-pad); accumulate
      per-channel sum/sumsq of u in scratch; u chunk --DMA--> HBM buffer.
  P1: finalize (mu1, r1) at k==0; u chunk+halo --> vhat = (u-mu1)*r1
      (halo rows normalize with the same global stats); a = relu(vhat);
      s = conv2(reflect-pad(a)); accumulate stats2; s --> HBM; vhat interior
      --> HBM (the training residual: the backward needs vhat everywhere,
      including vhat < 0 where relu kills it).
  P2: finalize (mu2, r2); y = (s - mu2)*r2 + x chunk --> HBM.

HBM traffic: R x, W u, R u, W vhat, W s, R s, R x, W y = 8 planes vs the XLA
pipeline's ~11 — a modest cut; the forward A/B against the FENCED XLA path
(which already fixed the layout pathology this kernel was conceived against)
is the go/no-go gate for building the chunked backward (docs/KERNELS.md
round-2 rule 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy(src, dst, sem):
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    cp.wait()


def _pad_cols_reflect(x):
    """(R, W, C) -> (R, W+2, C) reflect pad along W."""
    return jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)


def _conv3x3_rows(buf, w, b, hc, wd, c):
    """3x3 conv over a (hc+2, W+2, C) padded VMEM block -> (hc*W, C) f32."""
    acc = jnp.zeros((hc * wd, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = buf[dy:dy + hc, dx:dx + wd, :].reshape(hc * wd, c)
            acc = acc + jnp.dot(patch, w[dy, dx],
                                preferred_element_type=jnp.float32)
    return acc + b.astype(jnp.float32)


def _fwd_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
                y_hbm, vhat_hbm, u_hbm, s_hbm, stats_ref,
                buf, buf2, sums, statv, sem_in, sem_in2, sem_out,
                *, eps, hc, k_chunks):
    n = pl.program_id(0)
    phase = pl.program_id(1)
    k = pl.program_id(2)
    _, h, wd, c = x_hbm.shape
    hw = h * wd

    def load_halo(src_hbm, dst):
        """rows [k*hc-1, k*hc+hc+1) of src into dst[0..hc+2) — reflect at the
        plane edges (padded row -1 = row 1; padded row H = row H-2). Three
        static-size DMAs: the chunk body + one row per halo side."""
        row0 = k * hc
        _copy(src_hbm.at[n, pl.ds(row0, hc)], dst.at[pl.ds(1, hc)], sem_in)
        top = jnp.where(k == 0, 1, row0 - 1)
        _copy(src_hbm.at[n, pl.ds(top, 1)], dst.at[pl.ds(0, 1)], sem_in2)
        bot = jnp.where(k == k_chunks - 1, h - 2, row0 + hc)
        _copy(src_hbm.at[n, pl.ds(bot, 1)], dst.at[pl.ds(hc + 1, 1)], sem_in2)

    @pl.when(phase == 0)
    def _p0():
        @pl.when(k == 0)
        def _():
            sums[...] = jnp.zeros_like(sums)
        load_halo(x_hbm, buf)
        u = _conv3x3_rows(_pad_cols_reflect(buf[...]), w1_ref[...],
                          b1_ref[...], hc, wd, c)
        sums[0, :] += jnp.sum(u, axis=0)
        sums[1, :] += jnp.sum(u * u, axis=0)
        buf2[0:hc] = u.reshape(hc, wd, c).astype(buf2.dtype)
        _copy(buf2.at[pl.ds(0, hc)], u_hbm.at[n, pl.ds(k * hc, hc)], sem_out)

    @pl.when(phase == 1)
    def _p1():
        @pl.when(k == 0)
        def _():
            mu1 = sums[0, :] / hw
            var1 = sums[1, :] / hw - mu1 * mu1
            statv[0, :] = mu1
            statv[1, :] = jax.lax.rsqrt(var1 + eps)
            sums[...] = jnp.zeros_like(sums)
        load_halo(u_hbm, buf)
        vhat = ((buf[...].astype(jnp.float32) - statv[0, :])
                * statv[1, :])
        a = jnp.maximum(vhat, 0.0).astype(buf.dtype)
        buf2[0:hc] = vhat[1:hc + 1].astype(buf2.dtype)
        _copy(buf2.at[pl.ds(0, hc)], vhat_hbm.at[n, pl.ds(k * hc, hc)],
              sem_out)
        s = _conv3x3_rows(_pad_cols_reflect(a), w2_ref[...], b2_ref[...],
                          hc, wd, c)
        sums[2, :] += jnp.sum(s, axis=0)
        sums[3, :] += jnp.sum(s * s, axis=0)
        buf2[0:hc] = s.reshape(hc, wd, c).astype(buf2.dtype)
        _copy(buf2.at[pl.ds(0, hc)], s_hbm.at[n, pl.ds(k * hc, hc)], sem_out)

    @pl.when(phase == 2)
    def _p2():
        @pl.when(k == 0)
        def _():
            mu2 = sums[2, :] / hw
            var2 = sums[3, :] / hw - mu2 * mu2
            statv[2, :] = mu2
            statv[3, :] = jax.lax.rsqrt(var2 + eps)
        _copy(s_hbm.at[n, pl.ds(k * hc, hc)], buf.at[pl.ds(0, hc)], sem_in)
        _copy(x_hbm.at[n, pl.ds(k * hc, hc)], buf2.at[pl.ds(hc, hc)], sem_in2)
        s = buf[0:hc].astype(jnp.float32)
        xc = buf2[hc:2 * hc].astype(jnp.float32)
        y = (s - statv[2, :]) * statv[3, :] + xc
        buf2[0:hc] = y.astype(buf2.dtype)
        _copy(buf2.at[pl.ds(0, hc)], y_hbm.at[n, pl.ds(k * hc, hc)], sem_out)
        stats_ref[0] = statv[...]


def _forward_chunked(x, w1, b1, w2, b2, eps, hc, interpret):
    n, h, wd, c = x.shape
    assert h % hc == 0, (h, hc)
    k_chunks = h // hc
    grid = (n, 3, k_chunks)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem_full = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, 4, c), lambda i, p, k: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # y
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # vhat residual
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # u buffer
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # s buffer
        jax.ShapeDtypeStruct((n, 4, c), jnp.float32),      # mu1,r1,mu2,r2
    )
    y, vhat, _, _, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, hc=hc, k_chunks=k_chunks),
        grid=grid,
        in_specs=[anyspec, vmem_full(w1.shape), vmem_full(b1.shape),
                  vmem_full(w2.shape), vmem_full(b2.shape)],
        out_specs=(anyspec, anyspec, anyspec, anyspec, stats_spec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((hc + 2, wd, c), x.dtype),    # buf (in)
            pltpu.VMEM((2 * hc, wd, c), x.dtype),    # buf2 (out staging)
            pltpu.VMEM((4, c), jnp.float32),         # sums
            pltpu.VMEM((4, c), jnp.float32),         # statv
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(x, w1, b1, w2, b2)
    return y, vhat, stats


def residual_block_chunked_fwd(x, w1, b1, w2, b2, *, eps: float = 1e-5,
                               hc: int = 16, interpret: bool = False):
    """Chunked fused ResidualBlock forward.

    Returns (y, vhat, stats) — vhat (pre-relu IN1 output) and stats
    (mu1, r1, mu2, r2 per batch) are the residuals the chunked backward
    consumes. x: (N, H, W, C) with H % hc == 0; w: (3, 3, C, C) HWIO-squared.
    """
    return _forward_chunked(x, w1, b1, w2, b2, eps, hc, interpret)
