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
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from parity_utils import (inject_patchgan, inject_pixeld,  # noqa: E402
                          inject_resnet_gen, inject_unet)

from cyclegan_tpu.train.cyclegan import CycleGANTrainer  # noqa: E402
from cyclegan_tpu.utils.config import Config  # noqa: E402
from tools.torch_reference import PatchD, PixelD, ResnetG, UnetG  # noqa: E402
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
    args = ap.parse_args()
    if args.norm == "batch" and (args.gen_net != "resnet"
                                 or args.dis_net != "patch"):
        ap.error("--norm batch supports --gen_net resnet --dis_net patch only")

    N, S, NB, C = args.classes, args.size, args.n_blocks, args.channels
    tnorm = torch.nn.BatchNorm2d if args.norm == "batch" \
        else torch.nn.InstanceNorm2d
    torch.manual_seed(0)
    if args.gen_net == "unet":
        downs = int(np.log2(S))  # bottleneck 1x1 (test convention)
        tgens = (UnetG(C, N, num_downs=downs, ngf=args.ngf, tanh=False),
                 UnetG(N, C, num_downs=downs, ngf=args.ngf, tanh=True))
    else:
        tgens = (ResnetG(C, N, args.ngf, NB, tanh=False, norm=tnorm),
                 ResnetG(N, C, args.ngf, NB, tanh=True, norm=tnorm))
    if args.dis_net == "pixel":
        tdis = (PixelD(C, args.ngf), PixelD(N, args.ngf))
    else:
        tdis = (PatchD(C, args.ngf, norm=tnorm), PatchD(N, args.ngf, norm=tnorm))
    tmodels = (*tgens, *tdis)
    t_opts = (
        torch.optim.Adam(itertools.chain(tmodels[0].parameters(),
                                         tmodels[1].parameters()),
                         2e-4, betas=(0.5, 0.999)),
        torch.optim.Adam(itertools.chain(tmodels[2].parameters(),
                                         tmodels[3].parameters()),
                         2e-4, betas=(0.5, 0.999)),
    )

    cfg = Config(gen_net="resnet_6blocks" if args.gen_net == "resnet"
                 else "unet_128",
                 dis_net="n_layers" if args.dis_net == "patch" else "pixel",
                 norm=args.norm, ngf=args.ngf, ndf=args.ngf,
                 bf16=False, crop_height=S, crop_width=S, batch_size=1,
                 pool_size=args.pool, epochs=10_000, decay_epoch=5_000)
    trainer = CycleGANTrainer(cfg, N, C, steps_per_epoch=1)
    if args.gen_net == "unet":
        trainer.G_i2l = trainer.G_i2l.clone(num_downs=downs)
        trainer.G_l2i = trainer.G_l2i.clone(num_downs=downs)
        inject_g = inject_unet
    else:
        trainer.G_i2l = trainer.G_i2l.clone(n_blocks=NB)
        trainer.G_l2i = trainer.G_l2i.clone(n_blocks=NB)
        inject_g = lambda p, t: inject_resnet_gen(p, t, NB)  # noqa: E731
    inject_d = inject_patchgan if args.dis_net == "patch" else inject_pixeld
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state._replace(
        g_i2l=inject_g(state.g_i2l, tmodels[0]),
        g_l2i=inject_g(state.g_l2i, tmodels[1]),
        d_img=inject_d(state.d_img, tmodels[2]),
        d_lab=inject_d(state.d_lab, tmodels[3]),
    )
    state = state._replace(
        g_opt=trainer.g_tx.init((state.g_i2l, state.g_l2i)),
        d_opt=trainer.d_tx.init((state.d_img, state.d_lab)),
    )

    g = torch.Generator().manual_seed(42)
    lab_img = torch.randn(1, C, S, S, generator=g)
    unlab_img = torch.randn(1, C, S, S, generator=g)
    lab_lab = torch.randint(0, N, (1, S, S), generator=g)
    lab_oh = torch.nn.functional.one_hot(lab_lab, N).permute(0, 3, 1, 2).float()
    batch = {
        "lab_image": jnp.asarray(lab_img.numpy().transpose(0, 2, 3, 1)),
        "lab_label": jnp.asarray(lab_lab.numpy()).astype(jnp.int32),
        "unlab_image": jnp.asarray(unlab_img.numpy().transpose(0, 2, 3, 1)),
    }

    # Pool-active mode: identical injected swap decisions drive both
    # frameworks' replay pools (the torch host list and the jax device ring
    # buffer) — the pooled D-input stream is then deterministic and shared.
    if args.pool > 0:
        from tools.torch_reference import HostPool

        dec_rng = np.random.default_rng(7)
        use_new = dec_rng.random((args.steps, 2, 1)) > 0.5
        swap_idx = dec_rng.integers(0, args.pool, (args.steps, 2, 1))
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
        # instrument the torch step's G loss identically
        t_curve.append(_torch_g_loss(tmodels, batch_t=(lab_img, lab_lab,
                                                       unlab_img, lab_oh)))
        tm = torch_step_impl(tmodels, t_opts,
                             (lab_img, lab_lab, unlab_img, lab_oh), **pool_kw)
        d_t.append(tm["d_total"])

    j, t = np.array(j_curve), np.array(t_curve)
    # jax metric is computed DURING the step (pre-update); torch probe is also
    # pre-update — comparable.
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
        "final_jax_g": round(float(j[-1]), 4),
        "final_torch_g": round(float(t[-1]), 4),
        "max_rel_divergence": round(float(rel.max()), 5),
        "mean_rel_divergence": round(float(rel.mean()), 6),
        "d_mean_abs_divergence": round(float(np.abs(dj - dt).mean()), 6),
        "d_max_abs_divergence": round(float(np.abs(dj - dt).max()), 6),
        "jax_miou": round(miou_j, 4),
        "torch_miou": round(miou_t, 4),
        "miou_delta": round(miou_j - miou_t, 4),
    }))


def _torch_g_loss(models, batch_t) -> float:
    """The G objective exactly as torch_reference.train_step computes it,
    evaluated without updating (pre-update probe). Under --norm batch the
    train-mode forwards below update BatchNorm running stats, so those
    buffers are snapshotted and restored — the probe must be side-effect
    free or it would desync the EMAs from the jax trajectory."""
    G_i2l, G_l2i, D_img, D_lab = models
    lab_img, lab_lab, unlab_img, lab_oh = batch_t
    mse = torch.nn.MSELoss()
    l1 = torch.nn.L1Loss()
    ce = torch.nn.CrossEntropyLoss(ignore_index=255)
    bn_saved = [(m, m.running_mean.clone(), m.running_var.clone(),
                 m.num_batches_tracked.clone())
                for mod in models for m in mod.modules()
                if isinstance(m, torch.nn.BatchNorm2d)]
    with torch.no_grad():
        fake_lab = torch.softmax(G_i2l(unlab_img), 1)
        fake_img = G_l2i(lab_oh)
        adv = mse(D_lab(fake_lab), torch.ones_like(D_lab(fake_lab))) + \
              mse(D_img(fake_img), torch.ones_like(D_img(fake_img)))
        cyc_img = l1(G_l2i(fake_lab), unlab_img) * 10.0
        cyc_lab = ce(G_i2l(fake_img), lab_lab) * 10.0
        sup = ce(G_i2l(lab_img), lab_lab)
        total = float(adv + cyc_img + cyc_lab + sup)
    for m, mean, var, nbt in bn_saved:
        m.running_mean.copy_(mean)
        m.running_var.copy_(var)
        m.num_batches_tracked.copy_(nbt)
    return total


if __name__ == "__main__":
    main()
