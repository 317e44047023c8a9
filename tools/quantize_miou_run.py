"""Quantization quality cost: mIoU of f32 vs bf16- vs int8-quantized
serving artifacts on the fixture val set (VERDICT r4 item 6).

The size wins of ``--export_quantize`` were measured in round 3 (int8 ~4x,
bf16 ~2x smaller) and per-weight rounding error is bounded
(tests/test_export_quantized.py), but the number a user deciding
int8-vs-bf16 actually needs is the METRIC cost. This trains a supervised
segmenter to above-chance quality on the synthetic corpus, exports the
SAME checkpoint three ways, serves the SAME val images through the real
standalone serving path (cyclegan_tpu.serve.run_serve, GT scoring on), and
reports the mIoU deltas next to the artifact sizes.

Prints one JSON line.
Run: python tools/quantize_miou_run.py [--steps 300] [--size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cyclegan_tpu import export as export_lib  # noqa: E402
from cyclegan_tpu import serve as serve_lib  # noqa: E402
from cyclegan_tpu.data.datasets import make_dataset  # noqa: E402
from cyclegan_tpu.data.loader import Loader  # noqa: E402
from cyclegan_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from cyclegan_tpu.train.supervised import SupervisedTrainer  # noqa: E402
from cyclegan_tpu.utils.config import Config  # noqa: E402
from cyclegan_tpu.utils.cpuflags import apply_tool_platform  # noqa: E402


def train_and_measure(steps: int, size: int, ngf: int, batch: int,
                      classes: int, workdir: str, *,
                      checkpoint_dir: str | None = None,
                      semisupervised: bool = False,
                      gen_net: str = "resnet_6blocks", ndf: int = 8,
                      platforms: tuple = ("cpu",)) -> dict:
    """Train briefly, export f32/bf16/int8 artifacts of the SAME checkpoint,
    serve the SAME val PNGs with each, return the scores + sizes dict.
    Shared by the CLI below and tests/test_quantize_miou.py (which runs it
    at a smaller scale and gates the deltas). Passing ``checkpoint_dir``
    skips the training phase and measures an EXISTING checkpoint instead
    (e.g. a converged soak run's ``best/`` — the deltas that matter are the
    ones on a genuinely trained model); gen_net/ngf/ndf/semisupervised must
    then match how it was trained."""
    from PIL import Image

    work = Path(workdir)
    cfg = Config(dataset="synthetic", gen_net=gen_net, ngf=ngf,
                 ndf=ndf, bf16=False, crop_height=size, crop_width=size,
                 batch_size=batch, epochs=10_000, decay_epoch=5_000,
                 checkpoint_dir=checkpoint_dir or str(work / "ckpt"),
                 results_dir=str(work / "out"))

    if checkpoint_dir is None:
        # ---- train to above-chance quality (deltas on a random net would
        # be meaningless: every artifact would score ~1/classes)
        train_ds = make_dataset("synthetic", split="train", size=64)
        loader = Loader(train_ds, batch_size=batch, crop_hw=(size, size),
                        train=True, seed=0)
        trainer = SupervisedTrainer(cfg, classes, 3, steps_per_epoch=1)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = jax.jit(trainer.train_step, donate_argnums=0)
        done, e = 0, 0
        while done < steps:
            for b in loader.epoch(e):
                state, _ = step(state, {"image": jnp.asarray(b["image"]),
                                        "label": jnp.asarray(b["label"])})
                done += 1
                if done >= steps:
                    break
            e += 1
        ckpt = CheckpointManager(cfg.checkpoint_dir, async_save=False)
        ckpt.save(0, jax.device_get(state))
        ckpt.wait()
        ckpt.close()

    # ---- the fixture val set as PNGs + GT masks (the standalone serving
    # host's actual input format)
    val_ds = make_dataset("synthetic", split="val", size=24)
    val_loader = Loader(val_ds, batch_size=1, crop_hw=(size, size),
                        train=False, drop_last=False)
    img_dir, gt_dir = work / "val_img", work / "val_gt"
    img_dir.mkdir(parents=True, exist_ok=True)
    gt_dir.mkdir(parents=True, exist_ok=True)
    for i, b in enumerate(val_loader.epoch(0)):
        # Denormalize to the on-disk pixel convention; every artifact sees
        # the same re-normalized bytes, so deltas are unaffected.
        px = np.clip((b["image"][0] + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(px).save(img_dir / f"img_{i:03d}.png")
        Image.fromarray(b["label"][0].astype(np.uint8), mode="L").save(
            gt_dir / f"img_{i:03d}.png")

    # ---- three artifacts of the SAME checkpoint, scored on the SAME set
    out = {"steps": None if checkpoint_dir else steps, "size": size,
           "checkpoint": checkpoint_dir,
           "jax_platform": jax.default_backend()}
    for quant in (None, "bf16", "int8"):
        name = quant or "f32"
        path = str(work / f"seg_{name}.shlo")
        export_lib.run_export(cfg, path, semisupervised=semisupervised,
                              what="segment", platforms=platforms,
                              quantize=quant)
        res = serve_lib.run_serve(path, str(img_dir),
                                  str(work / f"pred_{name}"),
                                  batch_size=4, gt_dir=str(gt_dir))
        out[f"miou_{name}"] = round(float(res["miou"]), 4)
        out[f"pixel_acc_{name}"] = round(float(res["pixel_acc"]), 4)
        out[f"bytes_{name}"] = os.path.getsize(path)
    out["delta_bf16"] = round(out["miou_bf16"] - out["miou_f32"], 4)
    out["delta_int8"] = round(out["miou_int8"] - out["miou_f32"], 4)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=None,
                    help="training steps (default 300); incompatible with "
                         "--checkpoint, which skips training")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--ngf", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--classes", type=int, default=None,
                    help="classes for the trained fixture net (default "
                         "21); incompatible with --checkpoint (the "
                         "restored net fixes its own class count)")
    ap.add_argument("--checkpoint", default=None,
                    help="measure an EXISTING checkpoint dir instead of "
                         "training one (gen_net/ngf/ndf/--semisup must "
                         "match how it was trained)")
    ap.add_argument("--semisup", action="store_true",
                    help="the checkpoint is a semi-sup CycleGAN state "
                         "(G_i2l is the segmenter)")
    ap.add_argument("--gen_net", default="resnet_6blocks")
    ap.add_argument("--ndf", type=int, default=8)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                    help="'default' lets jax pick the real device and "
                         "lowers the artifacts for cpu+tpu")
    args = ap.parse_args()
    if args.checkpoint and (args.steps is not None
                            or args.classes is not None):
        ap.error("--steps/--classes configure the freshly-trained fixture "
                 "net and are ignored with --checkpoint — drop them")
    apply_tool_platform(args.platform)
    platforms = ("cpu",) if args.platform == "cpu" else ("cpu", "tpu")
    with tempfile.TemporaryDirectory() as tmp:
        print(json.dumps(train_and_measure(
            args.steps if args.steps is not None else 300, args.size,
            args.ngf, args.batch,
            args.classes if args.classes is not None else 21, tmp,
            checkpoint_dir=args.checkpoint, semisupervised=args.semisup,
            gen_net=args.gen_net, ndf=args.ndf, platforms=platforms)))


if __name__ == "__main__":
    main()
