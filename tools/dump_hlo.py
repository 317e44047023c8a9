"""Dump the optimized (post-layout, post-fusion) HLO of the semi-sup train
step as compiled for the current backend — the join key for
tools/attribute_trace.py.

  python tools/dump_hlo.py --size 256 --batch 1 --out /tmp/step.hlo
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--gen_net", default="resnet_9blocks")
    ap.add_argument("--out", default="/tmp/train_step.hlo")
    args = ap.parse_args()

    from cyclegan_tpu.parallel import (
        jit_step, make_mesh, replicate_state, shard_batch)
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    s, b = args.size, args.batch
    cfg = Config(dataset="synthetic", gen_net=args.gen_net, crop_height=s,
                 crop_width=s, batch_size=b, bf16=True)
    tr = CycleGANTrainer(cfg, 21, 3, 100)
    mesh = make_mesh(1)
    state = replicate_state(tr.init_state(jax.random.PRNGKey(0)), mesh)
    rng = jax.random.PRNGKey(1)
    batch = shard_batch({
        "lab_image": jax.random.uniform(rng, (b, s, s, 3), minval=-1, maxval=1),
        "lab_label": jax.random.randint(rng, (b, s, s), 0, 21),
        "unlab_image": jax.random.uniform(rng, (b, s, s, 3), minval=-1, maxval=1),
    }, mesh)
    compiled = jax.jit(tr.train_step, donate_argnums=0).lower(state, batch).compile()
    txt = compiled.as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {args.out} ({len(txt)} bytes)")
    print("memory:", compiled.memory_analysis())


if __name__ == "__main__":
    main()
