"""Isolated hardware A/B of the chunked ResidualBlock forward kernel vs the
XLA composition at trunk shapes (the go/no-go gate for the chunked backward —
docs/KERNELS.md round-2 rule 3, VERDICT r2 item 1).

Both sides produce the TRAINING forward outputs (y plus the vhat residual) so
the comparison includes residual-write traffic. Reps are chained on-device
(y feeds the next x) per the round-2 measurement discipline: the axon
tunnel's ~25 ms RTT masquerades as op time otherwise.

Run: python tools/bench_resblock_chunked.py [--reps 100] [--hc 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def xla_train_forward(x, w1, b1, w2, b2, eps=1e-5):
    from cyclegan_tpu.ops import functional as F

    u = F.conv2d(F.reflect_pad(x, 1), w1, b1, compute_dtype=x.dtype)
    vhat = F.instance_norm(u, eps=eps)
    a = jax.nn.relu(vhat).astype(x.dtype)
    s = F.conv2d(F.reflect_pad(a, 1), w2, b2, compute_dtype=x.dtype)
    y = (F.instance_norm(s, eps=eps) + x.astype(jnp.float32)).astype(x.dtype)
    return y, vhat.astype(x.dtype)


def bench(fn, x, reps, label):
    def chained(x0):
        def body(_, carry):
            y, aux = fn(carry)
            # data dependency on both outputs so neither is elided
            return y + (aux.astype(y.dtype) * 0 if aux.shape == y.shape
                        else y * 0)
        return jax.lax.fori_loop(0, reps, body, x0)

    run = jax.jit(chained)
    r = run(x)
    np.asarray(jax.device_get(r[..., 0, 0]))  # materialize (tunnel-safe)
    t0 = time.perf_counter()
    r = run(x)
    np.asarray(jax.device_get(r[..., 0, 0]))
    dt = time.perf_counter() - t0
    us = dt / reps * 1e6
    print(f"{label}: {us:.1f} us/rep  ({reps} chained reps, {dt:.3f}s total)",
          flush=True)
    return us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--hc", type=int, default=16)
    ap.add_argument("--shape", type=str, default="1,64,64,256")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="also A/B the fwd+bwd (value_and_grad) path")
    args = ap.parse_args()
    n, h, w, c = map(int, args.shape.split(","))
    dtype = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), dtype)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dtype)
    b1 = jnp.asarray(rng.normal(size=(c,)) * 0.05, dtype)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dtype)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.05, dtype)

    from cyclegan_tpu.kernels.resblock_chunked import residual_block_chunked_fwd

    print(f"platform={jax.devices()[0].platform} shape={x.shape} "
          f"dtype={dtype} hc={args.hc}", flush=True)

    def chunked(xv):
        y, vhat, _ = residual_block_chunked_fwd(
            xv, w1, b1, w2, b2, hc=args.hc)
        return y, vhat

    def xla(xv):
        return xla_train_forward(xv, w1, b1, w2, b2)

    # correctness spot-check on-device first
    yc, vc = jax.jit(chunked)(x)
    yx, vx = jax.jit(xla)(x)
    err = float(jnp.abs(yc.astype(jnp.float32) - yx.astype(jnp.float32)).max())
    print(f"max |y_chunked - y_xla| = {err:.4f} (bf16 noise expected)",
          flush=True)

    t_xla = bench(xla, x, args.reps, "xla   fwd")
    t_chk = bench(chunked, x, args.reps, "chunk fwd")
    print(f"fwd speedup: {t_xla / t_chk:.3f}x", flush=True)

    if args.train:
        from cyclegan_tpu.kernels.resblock import residual_block_reference
        from cyclegan_tpu.kernels.resblock_chunked import (
            residual_block_chunked)

        dy = jnp.asarray(rng.normal(size=(n, h, w, c)), dtype)

        def grad_of(block_fn):
            def loss(xv):
                return jnp.vdot(block_fn(xv).astype(jnp.float32),
                                dy.astype(jnp.float32))
            g = jax.grad(loss)
            return lambda xv: (g(xv), xv)  # (dx, passthrough)

        xla_train = grad_of(
            lambda xv: residual_block_reference(xv, w1, b1, w2, b2))
        chk_train = grad_of(
            lambda xv: residual_block_chunked(xv, w1, b1, w2, b2, 1e-5,
                                              args.hc, False))
        # correctness spot check
        gx = jax.jit(lambda v: xla_train(v)[0])(x)
        gc = jax.jit(lambda v: chk_train(v)[0])(x)
        gerr = float(jnp.abs(gx.astype(jnp.float32)
                             - gc.astype(jnp.float32)).max())
        print(f"max |dx_chunked - dx_xla| = {gerr:.4f}", flush=True)
        t_xla_t = bench(xla_train, x, args.reps, "xla   fwd+bwd")
        t_chk_t = bench(chk_train, x, args.reps, "chunk fwd+bwd")
        print(f"train speedup: {t_xla_t / t_chk_t:.3f}x", flush=True)


if __name__ == "__main__":
    main()
