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


def _forward_chunked_impl(x, w1, b1, w2, b2, eps, hc, interpret):
    """Returns (y, vhat, u, s, stats)."""
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
    y, vhat, u, s, stats = pl.pallas_call(
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
    return y, vhat, u, s, stats


def residual_block_chunked_fwd(x, w1, b1, w2, b2, *, eps: float = 1e-5,
                               hc: int = 16, interpret: bool = False):
    """Chunked fused ResidualBlock forward.

    Returns (y, vhat, stats) — vhat (pre-relu IN1 output) and stats
    (mu1, r1, mu2, r2 per batch) are the residuals the chunked backward
    consumes. x: (N, H, W, C) with H % hc == 0; w: (3, 3, C, C) HWIO-squared.
    """
    y, vhat, _, _, stats = _forward_chunked_impl(x, w1, b1, w2, b2, eps, hc,
                                                 interpret)
    return y, vhat, stats


# ---------------------------------------------------------------------------
# Chunked backward
# ---------------------------------------------------------------------------
#
# Given residuals (x, vhat, s, stats=[mu1, r1, mu2, r2]) and dy:
#   shat = (s - mu2) * r2
#   ds   = r2 * (dy - mean(dy) - shat * mean(dy*shat))          [IN2 vjp]
#   da   = fold_reflect_pad( conv2^T (ds) )
#   dv   = da * (vhat > 0)                                       [relu vjp]
#   du   = r1 * (dv - mean(dv) - vhat * mean(dv*vhat))           [IN1 vjp]
#   dx   = dy + fold_reflect_pad( conv1^T (du) )                 [+residual]
#   dw2[t] = pad(relu(vhat))[t-shift]^T ds ;  dw1[t] = pad(x)[t-shift]^T du
#   db1 = db2 = 0 (a pre-IN per-channel constant cancels in the mean)
#
# All means are GLOBAL over (H, W) -> three phases like the forward:
#   P0: accumulate sum(dy), sum(dy*shat)                          (chunked)
#   P1: ds (chunk + 1-row ZERO halo -- gradients have no reflect rows),
#       da/dv chunk (+ explicit fold terms at the plane edges), accumulate
#       sum(dv), sum(dv*vhat) and the dw2 partials; dv chunk -> HBM
#   P2: du (chunk + halo from the dv buffer), dx chunk, dw1 partials.
#
# dw accumulators live in VMEM scratch across the whole (N, 3, K) grid
# (zeroed once at the very first step) -- in-kernel dw accumulation over both
# chunks and batch.


def _igrad_local(g_local, w, rows, wd, c):
    """conv^T of a local (rows, W, C) f32 grad block -> padded-coords local
    block (rows+2, W+2, C) f32 (row j <- g rows j-2..j, like the full-plane
    _conv3x3_igrad)."""
    dpad = jnp.zeros((rows + 2, wd + 2, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            contrib = jnp.dot(g_local.reshape(rows * wd, c),
                              w[dy, dx].T.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            dpad = dpad + jnp.pad(
                contrib.reshape(rows, wd, c),
                ((dy, 2 - dy), (dx, 2 - dx), (0, 0)))
    return dpad


def _fold_cols(dpad_rows):
    """Column part of the reflect-pad-1 VJP, applied per row:
    (R, W+2, C) -> (R, W, C)."""
    wd = dpad_rows.shape[1] - 2
    g = dpad_rows[:, 1:-1, :]
    g = g + jnp.pad(dpad_rows[:, 0:1, :], ((0, 0), (1, wd - 2), (0, 0)))
    g = g + jnp.pad(dpad_rows[:, -1:, :], ((0, 0), (wd - 2, 1), (0, 0)))
    return g


def _wgrad_partial(act_padded, g_rows, hc, wd, c):
    """dw[t] partial from this chunk's g rows: act_padded is (hc+2, W+2, C),
    g_rows is (hc*W, C) f32. Returns (3, 3, C, C) f32."""
    rows = []
    for dy in range(3):
        cols = []
        for dx in range(3):
            patch = act_padded[dy:dy + hc, dx:dx + wd, :].reshape(hc * wd, c)
            cols.append(jax.lax.dot_general(
                patch, g_rows, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _bwd_kernel(x_hbm, dy_hbm, vhat_hbm, s_hbm, stats_ref,
                w1_ref, w2_ref,
                dx_hbm, dw1_ref, dw2_ref, dv_hbm,
                bufa, bufb, bufc, bufo, sums, dw1acc, dw2acc,
                sem_a, sem_b, sem_c, sem_out,
                *, eps, hc, k_chunks):
    n = pl.program_id(0)
    phase = pl.program_id(1)
    k = pl.program_id(2)
    _, h, wd, c = x_hbm.shape
    hw = h * wd
    first = jnp.logical_and(n == 0,
                            jnp.logical_and(phase == 0, k == 0))

    mu2 = stats_ref[0, 2, :]
    r2 = stats_ref[0, 3, :]
    r1 = stats_ref[0, 1, :]

    def load_reflect(src_hbm, dst, sem):
        row0 = k * hc
        _copy(src_hbm.at[n, pl.ds(row0, hc)], dst.at[pl.ds(1, hc)], sem)
        top = jnp.where(k == 0, 1, row0 - 1)
        _copy(src_hbm.at[n, pl.ds(top, 1)], dst.at[pl.ds(0, 1)], sem)
        bot = jnp.where(k == k_chunks - 1, h - 2, row0 + hc)
        _copy(src_hbm.at[n, pl.ds(bot, 1)], dst.at[pl.ds(hc + 1, 1)], sem)

    def load_zero_halo(src_hbm, dst, sem):
        """Gradient arrays: halo rows outside the plane are ZERO."""
        row0 = k * hc
        _copy(src_hbm.at[n, pl.ds(row0, hc)], dst.at[pl.ds(1, hc)], sem)
        # clamped neighbor rows; masked to zero at the plane edges below
        top = jnp.maximum(row0 - 1, 0)
        _copy(src_hbm.at[n, pl.ds(top, 1)], dst.at[pl.ds(0, 1)], sem)
        bot = jnp.minimum(row0 + hc, h - 1)
        _copy(src_hbm.at[n, pl.ds(bot, 1)], dst.at[pl.ds(hc + 1, 1)], sem)

    def halo_mask(rows_f32):
        """Zero the out-of-plane halo rows of a (hc+2, ...) f32 block."""
        idx = jax.lax.broadcasted_iota(jnp.int32, rows_f32.shape, 0)
        bad_top = jnp.logical_and(k == 0, idx == 0)
        bad_bot = jnp.logical_and(k == k_chunks - 1, idx == hc + 1)
        return jnp.where(jnp.logical_or(bad_top, bad_bot), 0.0, rows_f32)

    def ds_of(dy_blk, s_blk):
        shat = (s_blk.astype(jnp.float32) - mu2) * r2
        dyf = dy_blk.astype(jnp.float32)
        return (r2 * (dyf - sums[0, :] / hw - shat * (sums[1, :] / hw)))

    @pl.when(first)
    def _init():
        dw1acc[...] = jnp.zeros_like(dw1acc)
        dw2acc[...] = jnp.zeros_like(dw2acc)

    @pl.when(phase == 0)
    def _p0():
        @pl.when(k == 0)
        def _():
            sums[...] = jnp.zeros_like(sums)
        row0 = k * hc
        _copy(dy_hbm.at[n, pl.ds(row0, hc)], bufa.at[pl.ds(1, hc)], sem_a)
        _copy(s_hbm.at[n, pl.ds(row0, hc)], bufb.at[pl.ds(1, hc)], sem_b)
        dyf = bufa[1:hc + 1].astype(jnp.float32)
        shat = (bufb[1:hc + 1].astype(jnp.float32) - mu2) * r2
        sums[0, :] += jnp.sum(dyf, axis=(0, 1))
        sums[1, :] += jnp.sum(dyf * shat, axis=(0, 1))

    @pl.when(phase == 1)
    def _p1():
        @pl.when(k == 0)
        def _():
            sums[2, :] = jnp.zeros_like(sums[2, :])
            sums[3, :] = jnp.zeros_like(sums[3, :])
        load_zero_halo(dy_hbm, bufa, sem_a)
        load_zero_halo(s_hbm, bufb, sem_b)
        load_reflect(vhat_hbm, bufc, sem_c)
        ds_h = halo_mask(ds_of(bufa[...], bufb[...]))   # (hc+2, W, C) f32
        dpad = _igrad_local(ds_h, w2_ref[...], hc + 2, wd, c)
        # local padded row j <-> global padded row (row0-1)+j; chunk's da
        # rows are local 2..hc+1. Plane-edge folds: global padded row 0
        # (local 1, k==0) onto da row 1 (local 3); global padded H+1
        # (local hc+2, k==K-1) onto da row H-2 (local hc).
        sel = dpad[2:hc + 2]
        top_fold = jnp.pad(dpad[1:2], ((1, hc - 2), (0, 0), (0, 0)))
        bot_fold = jnp.pad(dpad[hc + 2:hc + 3], ((hc - 2, 1), (0, 0), (0, 0)))
        sel = sel + jnp.where(k == 0, 1.0, 0.0) * top_fold \
            + jnp.where(k == k_chunks - 1, 1.0, 0.0) * bot_fold
        da = _fold_cols(sel)                             # (hc, W, C) f32
        vh_chunk = bufc[1:hc + 1].astype(jnp.float32)
        dv = da * (vh_chunk > 0)
        sums[2, :] += jnp.sum(dv, axis=(0, 1))
        sums[3, :] += jnp.sum(dv * vh_chunk, axis=(0, 1))
        # dw2 partial: pad(relu(vhat)) over chunk+halo vs ds chunk rows
        a_h = jnp.maximum(bufc[...].astype(jnp.float32), 0.0)
        dw2acc[...] += _wgrad_partial(
            _pad_cols_reflect(a_h).astype(x_hbm.dtype),
            ds_h[1:hc + 1].reshape(hc * wd, c), hc, wd, c)
        bufo[0:hc] = dv.astype(bufo.dtype)
        _copy(bufo.at[pl.ds(0, hc)], dv_hbm.at[n, pl.ds(k * hc, hc)], sem_out)

    @pl.when(phase == 2)
    def _p2():
        load_zero_halo(dv_hbm, bufa, sem_a)
        load_reflect(vhat_hbm, bufc, sem_c)
        load_reflect(x_hbm, bufb, sem_b)
        dv_h = halo_mask(bufa[...].astype(jnp.float32))
        vh_h = bufc[...].astype(jnp.float32)
        # Elementwise on in-plane rows (dv halo rows are the neighbor
        # chunk's real dv); out-of-plane halo rows must be ZERO for the
        # conv-transpose — the du formula would otherwise emit
        # r1*(-m_dv - vh*m_dvv) there.
        du_h = halo_mask(
            r1 * (dv_h - sums[2, :] / hw - vh_h * (sums[3, :] / hw)))
        dpad = _igrad_local(du_h, w1_ref[...], hc + 2, wd, c)
        sel = dpad[2:hc + 2]
        top_fold = jnp.pad(dpad[1:2], ((1, hc - 2), (0, 0), (0, 0)))
        bot_fold = jnp.pad(dpad[hc + 2:hc + 3], ((hc - 2, 1), (0, 0), (0, 0)))
        sel = sel + jnp.where(k == 0, 1.0, 0.0) * top_fold \
            + jnp.where(k == k_chunks - 1, 1.0, 0.0) * bot_fold
        dxc = _fold_cols(sel)
        row0 = k * hc
        _copy(dy_hbm.at[n, pl.ds(row0, hc)], bufo.at[pl.ds(hc, hc)], sem_out)
        dx = bufo[hc:2 * hc].astype(jnp.float32) + dxc
        # dw1 partial: pad(x) chunk+halo vs du chunk rows
        dw1acc[...] += _wgrad_partial(
            _pad_cols_reflect(bufb[...]),
            du_h[1:hc + 1].reshape(hc * wd, c), hc, wd, c)
        bufo[0:hc] = dx.astype(bufo.dtype)
        _copy(bufo.at[pl.ds(0, hc)], dx_hbm.at[n, pl.ds(k * hc, hc)], sem_out)
        dw1_ref[...] = dw1acc[...]
        dw2_ref[...] = dw2acc[...]


def _backward_chunked(x, dy, vhat, s, stats, w1, w2, eps, hc, interpret):
    n, h, wd, c = x.shape
    k_chunks = h // hc
    grid = (n, 3, k_chunks)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem_full = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, 4, c), lambda i, p, k: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),          # dx
        jax.ShapeDtypeStruct(w1.shape, jnp.float32),     # dw1
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),     # dw2
        jax.ShapeDtypeStruct(x.shape, x.dtype),          # dv buffer
    )
    dx, dw1, dw2, _ = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, hc=hc, k_chunks=k_chunks),
        grid=grid,
        in_specs=[anyspec, anyspec, anyspec, anyspec, stats_spec,
                  vmem_full(w1.shape), vmem_full(w2.shape)],
        out_specs=(anyspec, vmem_full(w1.shape), vmem_full(w2.shape),
                   anyspec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((hc + 2, wd, c), x.dtype),   # bufa
            pltpu.VMEM((hc + 2, wd, c), x.dtype),   # bufb
            pltpu.VMEM((hc + 2, wd, c), x.dtype),   # bufc
            pltpu.VMEM((2 * hc, wd, c), x.dtype),   # bufo
            pltpu.VMEM((4, c), jnp.float32),        # sums
            pltpu.VMEM(w1.shape, jnp.float32),      # dw1acc
            pltpu.VMEM(w2.shape, jnp.float32),      # dw2acc
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(x, dy, vhat, s, stats, w1, w2)
    return dx, dw1, dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def residual_block_chunked(x, w1, b1, w2, b2, eps: float = 1e-5,
                           hc: int = 16, interpret: bool = False):
    """Chunked fused ResidualBlock, differentiable (fwd + bwd in Pallas).

    Identical semantics to kernels/resblock.residual_block_fused but tiled
    over H with halo DMA, so it fits ANY trunk shape (incl. the 256² crop's
    (64, 64, 256) that OOMs the whole-plane kernel). Bias grads are exactly
    zero (pre-IN constants cancel)."""
    y, _, _, _, _ = _forward_chunked_impl(x, w1, b1, w2, b2, eps, hc,
                                          interpret)
    return y


def _chunked_fwd_rule(x, w1, b1, w2, b2, eps, hc, interpret):
    y, vhat, _, s, stats = _forward_chunked_impl(x, w1, b1, w2, b2, eps, hc,
                                                 interpret)
    return y, (x, vhat, s, stats, w1, w2)


def _chunked_bwd_rule(eps, hc, interpret, res, dy):
    x, vhat, s, stats, w1, w2 = res
    dx, dw1, dw2 = _backward_chunked(x, dy, vhat, s, stats, w1, w2, eps, hc,
                                     interpret)
    return (dx, dw1.astype(w1.dtype), jnp.zeros((w1.shape[-1],), w1.dtype),
            dw2.astype(w2.dtype), jnp.zeros((w2.shape[-1],), w2.dtype))


residual_block_chunked.defvjp(_chunked_fwd_rule, _chunked_bwd_rule)
