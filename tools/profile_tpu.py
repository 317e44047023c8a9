"""Profile the train step on the TPU (SURVEY.md §5 tracing/profiling).

Runs warmup + N traced steps of the semi-sup CycleGAN update and writes a
TensorBoard-readable trace, plus prints step timing stats. Also supports
A/B-ing the Pallas fused instance-norm against the XLA fallback:

  python tools/profile_tpu.py --steps 10 --trace /tmp/trace
  CYCLEGAN_TPU_PALLAS=off python tools/profile_tpu.py --steps 10
"""

from __future__ import annotations

import argparse
import json
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--gen_net", type=str, default="resnet_9blocks")
    args = ap.parse_args()

    from cyclegan_tpu.parallel import (
        jit_step, make_mesh, replicate_state, shard_batch)
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", gen_net=args.gen_net,
                 crop_height=args.size, crop_width=args.size,
                 batch_size=args.batch, bf16=True, epochs=200, decay_epoch=100)
    tr = CycleGANTrainer(cfg, 21, 3, 100)
    mesh = make_mesh(1)
    state = replicate_state(tr.init_state(jax.random.PRNGKey(0)), mesh)
    step = jit_step(tr.train_step)
    rng = jax.random.PRNGKey(1)
    b, s = args.batch, args.size
    batch = shard_batch({
        "lab_image": jax.random.uniform(rng, (b, s, s, 3), minval=-1, maxval=1),
        "lab_label": jax.random.randint(rng, (b, s, s), 0, 21),
        "unlab_image": jax.random.uniform(rng, (b, s, s, 3), minval=-1, maxval=1),
    }, mesh)

    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, m = step(state, batch)
    jax.device_get(m)
    print(f"warmup(+compile): {time.perf_counter() - t0:.1f}s", flush=True)

    if args.trace:
        jax.profiler.start_trace(args.trace)
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        jax.device_get(m)          # per-step sync: honest latency incl. fetch
        times.append(time.perf_counter() - t0)
    if args.trace:
        jax.profiler.stop_trace()

    import numpy as np

    arr = np.array(times)
    print(json.dumps({
        "per_step_sync_ms": {
            "p50": round(float(np.percentile(arr, 50)) * 1e3, 2),
            "min": round(float(arr.min()) * 1e3, 2),
            "max": round(float(arr.max()) * 1e3, 2),
        },
        "steps_per_sec_sync": round(float(1.0 / np.median(arr)), 3),
        "trace": args.trace,
    }))


if __name__ == "__main__":
    main()
