"""Long-horizon semi-sup CycleGAN trajectory parity vs torch.

Runs N full alternating G/D steps (pool bypassed on both sides so the
trajectories are RNG-free) from identical injected weights on identical
fixed batches, and reports the per-step G-loss trajectories and their final
divergence. Extends tests/test_train_parity.py (3 steps) to a meaningful
horizon for BASELINE.md.

Config legs beyond the flagship ResNet+PatchGAN/instance one:
  --channels 1 --classes 4   the ACDC grayscale config family
  --gen_net unet --dis_net pixel   the U-Net + PixelD zoo pairing
  --norm batch               BatchNorm EMAs threaded through the whole run

Prints one JSON line.
Run: python tools/cyclegan_parity_run.py [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from parity_utils import (make_cyclegan_pair, make_fixed_batch,  # noqa: E402
                          make_pool_decisions)

from cyclegan_tpu.utils.cpuflags import apply_tool_platform  # noqa: E402
from tools.torch_reference import train_step as torch_step_impl  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--classes", type=int, default=5)
    ap.add_argument("--ngf", type=int, default=8)
    ap.add_argument("--n_blocks", type=int, default=2)
    ap.add_argument("--pool", type=int, default=0,
                    help="replay-pool size; >0 runs the POOL-ACTIVE loop on "
                         "both frameworks with identical injected swap "
                         "decisions (VERDICT r3 item 1)")
    ap.add_argument("--channels", type=int, default=3,
                    help="image channels (1 = the ACDC grayscale config)")
    ap.add_argument("--gen_net", choices=["resnet", "unet"], default="resnet")
    ap.add_argument("--dis_net", choices=["patch", "pixel"], default="patch")
    ap.add_argument("--norm", choices=["instance", "batch"], default="instance",
                    help="batch exercises the BN running-stat threading "
                         "end-to-end (resnet+patch only — the oracle's "
                         "UnetG/PixelD hard-code InstanceNorm)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the JAX side with bf16 COMPUTE (the shipping "
                         "TPU default, Config.bf16) against the same f32 "
                         "torch oracle — certifies the production numerics "
                         "at trajectory scale (VERDICT r4 item 1)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="JAX platform for OUR side (torch always runs on "
                         "host CPU): 'cpu' pins jax to CPU (CI-safe); "
                         "'default' lets jax pick the real device")
    args = ap.parse_args()
    if args.norm == "batch" and (args.gen_net != "resnet"
                                 or args.dis_net != "patch"):
        ap.error("--norm batch supports --gen_net resnet --dis_net patch only")
    apply_tool_platform(args.platform)

    N, S, NB, C = args.classes, args.size, args.n_blocks, args.channels
    tmodels, t_opts, trainer, state = make_cyclegan_pair(
        n_classes=N, size=S, ngf=args.ngf, n_blocks=NB, channels=C,
        gen_net=args.gen_net, dis_net=args.dis_net, norm=args.norm,
        pool_size=args.pool, batch_size=1, bf16=args.bf16)
    (lab_img, lab_lab, unlab_img, lab_oh), batch = make_fixed_batch(
        N, S, batch=1, channels=C)

    # Pool-active mode: identical injected swap decisions drive both
    # frameworks' replay pools (the torch host list and the jax device ring
    # buffer) — the pooled D-input stream is then deterministic and shared.
    if args.pool > 0:
        from tools.torch_reference import HostPool

        use_new, swap_idx = make_pool_decisions(args.steps, 1, args.pool)
        t_pools = (HostPool(args.pool), HostPool(args.pool))

    step = jax.jit(trainer.train_step, donate_argnums=0)
    j_curve, t_curve, d_j, d_t = [], [], [], []
    for s in range(args.steps):
        if args.pool > 0:
            b = dict(batch,
                     pool_use_new_img=jnp.asarray(use_new[s, 0]),
                     pool_idx_img=jnp.asarray(swap_idx[s, 0], jnp.int32),
                     pool_use_new_lab=jnp.asarray(use_new[s, 1]),
                     pool_idx_lab=jnp.asarray(swap_idx[s, 1], jnp.int32))
            pool_kw = dict(pools=t_pools, pool_decisions=(
                list(zip(use_new[s, 0], swap_idx[s, 0])),
                list(zip(use_new[s, 1], swap_idx[s, 1]))))
        else:
            b, pool_kw = batch, {}
        state, m = step(state, b)
        j_curve.append(float(m["g_total"]))
        d_j.append(float(m["d_total"]))
        tm = torch_step_impl(tmodels, t_opts,
                             (lab_img, lab_lab, unlab_img, lab_oh), **pool_kw)
        # Both frameworks report losses computed DURING the step from
        # pre-update params — directly comparable, no extra probe forwards
        # (which under --norm batch would also perturb the BN EMAs).
        t_curve.append(tm["g_total"])
        d_t.append(tm["d_total"])

    j, t = np.array(j_curve), np.array(t_curve)
    rel = np.abs(j - t) / np.maximum(np.abs(t), 1e-6)

    # Post-training segmentation parity: eval both G_i2l on the same val set.
    from cyclegan_tpu.data.datasets import make_dataset
    from cyclegan_tpu.data.loader import Loader
    from cyclegan_tpu.train import metrics as metrics_lib

    val_ds = make_dataset("synthetic", split="val", size=16)
    # synthetic is 21-class; clamp labels into this run's class count
    val_loader = Loader(val_ds, batch_size=2, crop_hw=(S, S), train=False,
                        drop_last=False)
    hist_j = np.zeros((N, N), np.int64)
    hist_t = np.zeros((N, N), np.int64)
    tmodels[0].eval()
    for vb in val_loader.epoch(0):
        lab = np.minimum(vb["label"], N - 1)
        img = vb["image"][..., :C]  # synthetic is 3-ch; slice for --channels 1
        pj = np.asarray(jnp.argmax(
            trainer.G_i2l.apply(state.g_i2l, jnp.asarray(img)), -1))
        with torch.no_grad():
            pt = tmodels[0](torch.from_numpy(
                img.transpose(0, 3, 1, 2).copy())).argmax(1).numpy()
        hist_j += np.asarray(metrics_lib.confusion_matrix(
            jnp.asarray(pj), jnp.asarray(lab), N))
        hist_t += np.asarray(metrics_lib.confusion_matrix(
            jnp.asarray(pt), jnp.asarray(lab), N))
    miou_j = float(metrics_lib.scores(jnp.asarray(hist_j))["miou"])
    miou_t = float(metrics_lib.scores(jnp.asarray(hist_t))["miou"])

    dj, dt = np.array(d_j), np.array(d_t)
    print(json.dumps({
        "steps": args.steps,
        "pool": args.pool,
        "gen_net": args.gen_net,
        "dis_net": args.dis_net,
        "norm": args.norm,
        "channels": C,
        "bf16": bool(args.bf16),
        "final_jax_g": round(float(j[-1]), 4),
        "final_torch_g": round(float(t[-1]), 4),
        "max_rel_divergence": round(float(rel.max()), 5),
        "mean_rel_divergence": round(float(rel.mean()), 6),
        "d_mean_abs_divergence": round(float(np.abs(dj - dt).mean()), 6),
        "d_max_abs_divergence": round(float(np.abs(dj - dt).max()), 6),
        "jax_miou": round(miou_j, 4),
        "torch_miou": round(miou_t, 4),
        "miou_delta": round(miou_j - miou_t, 4),
        "jax_platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
