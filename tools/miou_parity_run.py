"""mIoU parity run (BASELINE.md measurement protocol step 2).

Trains the SAME supervised segmentation model (ResNet generator + CE) in this
framework and in the torch-CPU reference-semantics implementation, from
IDENTICAL injected initial weights on IDENTICAL pre-materialized fixed-seed
batches, then evaluates both on the same validation set.

Prints one JSON line: {"jax_miou": ..., "torch_miou": ..., "delta": ...,
"jax_pixel_acc": ..., "torch_pixel_acc": ...}
Parity gate (BASELINE.json north star): |delta| <= 0.5 pts.

Run: python tools/miou_parity_run.py [--steps 300] [--size 64]
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

from parity_utils import inject_resnet_gen  # noqa: E402

from cyclegan_tpu.data.datasets import make_dataset  # noqa: E402
from cyclegan_tpu.data.loader import Loader  # noqa: E402
from cyclegan_tpu.train import metrics as metrics_lib  # noqa: E402
from cyclegan_tpu.train.supervised import SupervisedTrainer  # noqa: E402
from cyclegan_tpu.utils.config import Config  # noqa: E402
from cyclegan_tpu.utils.cpuflags import apply_tool_platform  # noqa: E402
from tools.torch_reference import ResnetG  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--ngf", type=int, default=8)
    ap.add_argument("--n_blocks", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--semisup", action="store_true",
                    help="run the FULL semi-sup CycleGAN protocol (both "
                         "frameworks, replay pools ON with identical "
                         "injected swap decisions — VERDICT r3 item 7) "
                         "instead of the supervised CE protocol")
    ap.add_argument("--pool", type=int, default=8,
                    help="pool size for --semisup")
    ap.add_argument("--bf16", action="store_true",
                    help="run the JAX side with bf16 COMPUTE (the shipping "
                         "TPU default, Config.bf16) against the same f32 "
                         "torch oracle — certifies the production numerics "
                         "at protocol scale (VERDICT r4 item 1)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="JAX platform for OUR side (torch always runs on "
                         "host CPU): 'cpu' pins jax to CPU (CI-safe); "
                         "'default' lets jax pick the real device — run "
                         "with --bf16 on the TPU to certify the shipping "
                         "numerics on the actual hardware")
    args = ap.parse_args()
    apply_tool_platform(args.platform)

    if args.semisup:
        run_semisup(args)
        return

    # ---- identical data: pre-materialized fixed-seed batches
    train_ds = make_dataset("synthetic", split="train", size=64)
    val_ds = make_dataset("synthetic", split="val", size=24)
    loader = Loader(train_ds, batch_size=args.batch,
                    crop_hw=(args.size, args.size), train=True, seed=0)
    batches = []
    e = 0
    while len(batches) < args.steps:
        for b in loader.epoch(e):
            batches.append(b)
            if len(batches) >= args.steps:
                break
        e += 1
    val_loader = Loader(val_ds, batch_size=args.batch,
                        crop_hw=(args.size, args.size), train=False,
                        drop_last=False)
    val_batches = list(val_loader.epoch(0))

    # ---- identical init
    torch.manual_seed(0)
    tmodel = ResnetG(3, args.classes, args.ngf, args.n_blocks, tanh=False)
    cfg = Config(gen_net="resnet_6blocks", ngf=args.ngf, bf16=args.bf16,
                 crop_height=args.size, crop_width=args.size,
                 batch_size=args.batch, epochs=10_000, decay_epoch=5_000)
    trainer = SupervisedTrainer(cfg, args.classes, 3, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state._replace(params=inject_resnet_gen(state.params, tmodel,
                                                    args.n_blocks))
    state = state._replace(opt_state=trainer.tx.init(state.params))

    # ---- torch training
    opt = torch.optim.Adam(tmodel.parameters(), 2e-4, betas=(0.5, 0.999))
    ce = torch.nn.CrossEntropyLoss(ignore_index=255)
    for b in batches:
        x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2).copy())
        y = torch.from_numpy(b["label"].astype(np.int64))
        opt.zero_grad()
        loss = ce(tmodel(x), y)
        loss.backward()
        opt.step()

    # ---- jax training on the same batches
    step = jax.jit(trainer.train_step, donate_argnums=0)
    for b in batches:
        state, _ = step(state, {"image": jnp.asarray(b["image"]),
                                "label": jnp.asarray(b["label"])})

    # ---- identical eval
    def eval_scores(predict):
        hist = np.zeros((args.classes, args.classes), np.int64)
        for b in val_batches:
            pred = predict(b["image"])
            hist += np.asarray(metrics_lib.confusion_matrix(
                jnp.asarray(pred), jnp.asarray(b["label"]), args.classes))
        s = metrics_lib.scores(jnp.asarray(hist))
        return float(s["miou"]), float(s["pixel_acc"])

    jax_pred = jax.jit(lambda img: jnp.argmax(
        trainer.model.apply(state.params, img), axis=-1))
    j_miou, j_pa = eval_scores(lambda img: np.asarray(jax_pred(jnp.asarray(img))))

    tmodel.eval()

    def torch_pred(img):
        with torch.no_grad():
            logits = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2).copy()))
        return logits.argmax(1).numpy()

    t_miou, t_pa = eval_scores(torch_pred)

    print(json.dumps({
        "jax_miou": round(j_miou, 4), "torch_miou": round(t_miou, 4),
        "delta": round(j_miou - t_miou, 4),
        "jax_pixel_acc": round(j_pa, 4), "torch_pixel_acc": round(t_pa, 4),
        "steps": args.steps, "size": args.size, "bf16": bool(args.bf16),
        "jax_platform": jax.default_backend(),
    }))


def run_semisup(args) -> None:
    """300-step semi-sup CycleGAN mIoU protocol, pools ON (VERDICT r3
    item 7): both frameworks train the full alternating G/D loop from
    identical injected weights on identical pre-materialized labeled/
    unlabeled batch streams, with the replay pools driven by ONE injected
    (use_new, swap_idx) decision stream; the trained G_i2l segmenters are
    then scored on the same validation set. Gate: |Δ mIoU| <= 0.5 pts."""
    from parity_utils import make_cyclegan_pair, make_pool_decisions

    from tools.torch_reference import HostPool, train_step as torch_step

    N, S, B, NB = args.classes, args.size, args.batch, args.n_blocks

    # ---- identical data: labeled (image+label) and unlabeled streams
    train_ds = make_dataset("synthetic", split="train", size=64)
    val_ds = make_dataset("synthetic", split="val", size=24)
    lab_loader = Loader(train_ds, batch_size=B, crop_hw=(S, S), train=True,
                        seed=0)
    unlab_loader = Loader(train_ds, batch_size=B, crop_hw=(S, S), train=True,
                          seed=1)

    def materialize(loader, n):
        out, e = [], 0
        while len(out) < n:
            for b in loader.epoch(e):
                out.append(b)
                if len(out) >= n:
                    break
            e += 1
        return out

    lab_batches = materialize(lab_loader, args.steps)
    unlab_batches = materialize(unlab_loader, args.steps)
    val_batches = list(Loader(val_ds, batch_size=B, crop_hw=(S, S),
                              train=False, drop_last=False).epoch(0))

    # ---- identical init (single copy of the pair protocol: parity_utils)
    tmodels, t_opts, trainer, state = make_cyclegan_pair(
        n_classes=N, size=S, ngf=args.ngf, n_blocks=NB,
        pool_size=args.pool, batch_size=B, bf16=args.bf16)

    # ---- one injected decision stream for both frameworks' pools
    use_new, swap_idx = make_pool_decisions(args.steps, B, args.pool)
    t_pools = (HostPool(args.pool), HostPool(args.pool))

    step = jax.jit(trainer.train_step, donate_argnums=0)
    for s in range(args.steps):
        lb, ub = lab_batches[s], unlab_batches[s]
        batch = {
            "lab_image": jnp.asarray(lb["image"]),
            "lab_label": jnp.asarray(lb["label"]).astype(jnp.int32),
            "unlab_image": jnp.asarray(ub["image"]),
            "pool_use_new_img": jnp.asarray(use_new[s, 0]),
            "pool_idx_img": jnp.asarray(swap_idx[s, 0], jnp.int32),
            "pool_use_new_lab": jnp.asarray(use_new[s, 1]),
            "pool_idx_lab": jnp.asarray(swap_idx[s, 1], jnp.int32),
        }
        state, _ = step(state, batch)

        lab_img = torch.from_numpy(lb["image"].transpose(0, 3, 1, 2).copy())
        lab_lab = torch.from_numpy(lb["label"].astype(np.int64))
        unlab_img = torch.from_numpy(ub["image"].transpose(0, 3, 1, 2).copy())
        lab_oh = torch.nn.functional.one_hot(
            torch.where(lab_lab == 255, 0, lab_lab), N
        ).permute(0, 3, 1, 2).float() * (lab_lab != 255)[:, None]
        torch_step(tmodels, t_opts, (lab_img, lab_lab, unlab_img, lab_oh),
                   pools=t_pools,
                   pool_decisions=(list(zip(use_new[s, 0], swap_idx[s, 0])),
                                   list(zip(use_new[s, 1], swap_idx[s, 1]))))

    # ---- identical eval of the trained segmenters
    def eval_scores(predict):
        hist = np.zeros((N, N), np.int64)
        for b in val_batches:
            pred = predict(b["image"])
            hist += np.asarray(metrics_lib.confusion_matrix(
                jnp.asarray(pred), jnp.asarray(b["label"]), N))
        s = metrics_lib.scores(jnp.asarray(hist))
        return float(s["miou"]), float(s["pixel_acc"])

    jax_pred = jax.jit(lambda img: jnp.argmax(
        trainer.G_i2l.apply(state.g_i2l, img), axis=-1))
    j_miou, j_pa = eval_scores(
        lambda img: np.asarray(jax_pred(jnp.asarray(img))))
    tmodels[0].eval()

    def torch_pred(img):
        with torch.no_grad():
            logits = tmodels[0](torch.from_numpy(
                img.transpose(0, 3, 1, 2).copy()))
        return logits.argmax(1).numpy()

    t_miou, t_pa = eval_scores(torch_pred)
    print(json.dumps({
        "protocol": "semisup_pool_active",
        "jax_miou": round(j_miou, 4), "torch_miou": round(t_miou, 4),
        "delta": round(j_miou - t_miou, 4),
        "jax_pixel_acc": round(j_pa, 4), "torch_pixel_acc": round(t_pa, 4),
        "steps": args.steps, "size": args.size, "pool": args.pool,
        "bf16": bool(args.bf16), "jax_platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
