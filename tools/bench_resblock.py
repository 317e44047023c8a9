"""A/B the ResidualBlock forward megakernel vs the XLA composition on the
current backend (trunk shape by default). Forward-only — the training win
requires the Pallas backward (docs/KERNELS.md).

Run: python tools/bench_resblock.py [--batch 8] [--iters 100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--grad", action="store_true",
                    help="time value_and_grad (forward+backward) instead")
    args = ap.parse_args()

    from cyclegan_tpu.kernels.resblock import (
        residual_block_fused, residual_block_reference)

    dt = jnp.dtype(args.dtype)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (args.batch, args.hw, args.hw, args.c)).astype(dt)
    w1 = (0.02 * jax.random.normal(ks[1], (3, 3, args.c, args.c))).astype(dt)
    b1 = jnp.zeros((args.c,), dt)
    w2 = (0.02 * jax.random.normal(ks[2], (3, 3, args.c, args.c))).astype(dt)
    b2 = jnp.zeros((args.c,), dt)

    if args.grad:
        def mk(fn):
            def loss(x, w1, w2):
                return jnp.sum(fn(x, w1, b1, w2, b2) ** 2).astype(jnp.float32)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            return lambda x, w1, b1_, w2, b2_: g(x, w1, w2)

        fused = mk(residual_block_fused)
        ref = mk(residual_block_reference)
    else:
        fused = jax.jit(lambda *a: residual_block_fused(*a))
        ref = jax.jit(lambda *a: residual_block_reference(*a))

    out: dict = {"shape": list(x.shape), "dtype": args.dtype,
                 "platform": jax.devices()[0].platform}
    for name, fn in [("fused", fused), ("xla", ref)]:
        y = fn(x, w1, b1, w2, b2)
        jax.device_get(y)  # warm + materialize
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = fn(x, w1, b1, w2, b2)
        jax.device_get(y)
        dt_s = time.perf_counter() - t0
        out[f"{name}_us_per_call"] = round(dt_s / args.iters * 1e6, 1)
    # numerical agreement on this backend
    a, b = fused(x, w1, b1, w2, b2), ref(x, w1, b1, w2, b2)
    if args.grad:
        d = max(float(jnp.abs(u.astype(jnp.float32) - v.astype(jnp.float32)).max())
                for u, v in zip(a, b))
    else:
        d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    out["max_abs_diff"] = d
    out["mode"] = "grad" if args.grad else "forward"
    out["speedup_fused_vs_xla"] = round(
        out["xla_us_per_call"] / out["fused_us_per_call"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
