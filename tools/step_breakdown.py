"""Attribute train-step time to components on the real TPU (round-2 perf
work, VERDICT.md item 1): times each piece of the semi-sup step in isolation
so the optimization target is measured, not guessed.

Pieces (at the flagship 256x256 b1 config unless --size says otherwise):
  g_fwd        one ResNet-9 generator apply (image->label head)
  g_fwdbwd     value_and_grad of a scalar loss over one generator apply
  d_fwd        one PatchGAN apply
  d_fwdbwd     value_and_grad over one PatchGAN apply
  g_phase      the full G loss (5 generator applies' worth) fwd+bwd + Adam
  d_phase      pool query + D loss fwd+bwd + Adam
  resblock_xla     one trunk ResidualBlock fwd (XLA) at the trunk shape
  resblock_xla_bwd one trunk ResidualBlock fwd+bwd (XLA)
  full         the complete train step (reference number)

Timing: median of --steps calls, chained through donated buffers, fetched by
device_get (tunnel-safe). Each piece is jitted separately.

Usage: python tools/step_breakdown.py [--size 256] [--steps 20]
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
import numpy as np


def _time_fn(fn, args, steps: int, warmup: int = 3) -> float:
    """Median wall ms per call; output fetched once at the end."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of piece names")
    args = ap.parse_args()

    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    s, b = args.size, args.batch
    cfg = Config(dataset="synthetic", gen_net="resnet_9blocks",
                 crop_height=s, crop_width=s, batch_size=b, bf16=True)
    tr = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=100)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    img = jax.random.uniform(rng, (b, s, s, 3), jnp.float32, -1, 1)
    lab = jax.random.randint(rng, (b, s, s), 0, 21)
    batch = {"lab_image": img, "lab_label": lab, "unlab_image": img}

    results: dict[str, float] = {}
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    if want("g_fwd"):
        f = jax.jit(lambda p, x: tr.G_i2l.apply(p, x))
        results["g_fwd"] = _time_fn(f, (state.g_i2l, img), args.steps)

    if want("g_fwdbwd"):
        def loss(p, x):
            return jnp.mean(jnp.square(tr.G_i2l.apply(p, x)))
        f = jax.jit(jax.value_and_grad(loss))
        results["g_fwdbwd"] = _time_fn(f, (state.g_i2l, img), args.steps)

    if want("d_fwd"):
        f = jax.jit(lambda p, x: tr.D_img.apply(p, x))
        results["d_fwd"] = _time_fn(f, (state.d_img, img), args.steps)

    if want("d_fwdbwd"):
        def dloss(p, x):
            return jnp.mean(jnp.square(tr.D_img.apply(p, x)))
        f = jax.jit(jax.value_and_grad(dloss))
        results["d_fwdbwd"] = _time_fn(f, (state.d_img, img), args.steps)

    # Trunk resblock shapes: 256-crop trunk is (b, s/4, s/4, 256).
    if want("resblock_xla") or want("resblock_xla_bwd"):
        from cyclegan_tpu.kernels.resblock import (
            residual_block_fused, residual_block_reference, supported)

        th, tw, tc = s // 4, s // 4, 256
        x = jax.random.uniform(rng, (b, th, tw, tc), jnp.float32).astype(jnp.bfloat16)
        w1 = (jax.random.normal(rng, (3, 3, tc, tc)) * 0.02).astype(jnp.bfloat16)
        bias = jnp.zeros((tc,), jnp.bfloat16)
        if want("resblock_xla"):
            f = jax.jit(lambda *a: residual_block_reference(*a))
            results["resblock_xla"] = _time_fn(f, (x, w1, bias, w1, bias), args.steps)
        if want("resblock_xla_bwd"):
            def rb_loss(x, w1, b1, w2, b2):
                return jnp.mean(jnp.square(
                    residual_block_reference(x, w1, b1, w2, b2).astype(jnp.float32)))
            f = jax.jit(jax.value_and_grad(rb_loss, argnums=(0, 1, 3)))
            results["resblock_xla_bwd"] = _time_fn(
                f, (x, w1, bias, w1, bias), args.steps)
        if want("resblock_fused_bwd") and supported(x.shape, 2):
            def rb_loss_f(x, w1, b1, w2, b2):
                return jnp.mean(jnp.square(
                    residual_block_fused(x, w1, b1, w2, b2).astype(jnp.float32)))
            f = jax.jit(jax.value_and_grad(rb_loss_f, argnums=(0, 1, 3)))
            results["resblock_fused_bwd"] = _time_fn(
                f, (x, w1, bias, w1, bias), args.steps)

    if want("full"):
        f = jax.jit(tr.train_step)
        results["full"] = _time_fn(f, (state, batch), args.steps)

    print(json.dumps({"size": s, "batch": b,
                      "ms": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
