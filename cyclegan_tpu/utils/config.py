"""Typed config + the 5 benchmark presets (SURVEY.md §5 "Config / flag system").

Flag names mirror the reference's argparse surface where cheap (epochs,
decay_epoch, batch_size, lr, lamda, crop_height/width, ngf/ndf, gen_net,
dis_net, norm, dataset, checkpoint_dir, results_dir). Values marked
"[assumed]" are reference defaults recalled from [M]/[P] provenance (the
mount was empty — SURVEY.md §0); they are config values, trivially fixable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class Config:
    # model
    gen_net: str = "resnet_9blocks"
    dis_net: str = "n_layers"
    n_layers_D: int = 3
    ngf: int = 64
    ndf: int = 64
    norm: str = "instance"
    use_dropout: bool = False

    # optimization (reference defaults [assumed]: lr 2e-4, betas (0.5, 0.999),
    # lamda 10, epochs 200 w/ decay at 100, pool size 50)
    epochs: int = 200
    decay_epoch: int = 100
    batch_size: int = 1
    lr: float = 2e-4
    lamda: float = 10.0          # cycle-consistency weight (reference flag name)
    lamda_lab: float | None = None  # label-cycle CE weight; None -> lamda
    pool_size: int = 50
    labeled_fraction: float = 0.125
    # Labeled/unlabeled epoch pairing: "zip" = reference semantics (epoch
    # ends at the shorter, i.e. labeled, stream — SURVEY.md §3a line 149);
    # "cycle" = epoch set by the unlabeled stream, labeled cycles (round-1
    # behavior, opt-in).
    pairing: str = "zip"

    # data
    dataset: str = "voc2012"
    data_root: str | None = None
    loader: str = "native"             # native (thread + C++ kernels) | grain
    loader_workers: int = 0            # grain worker processes
    crop_height: int = 256
    crop_width: int = 256
    # Optional fixed resize BEFORE the random crop (the reference pipeline's
    # resize/random-crop convention is ambiguous without the mount —
    # VERDICT round-1 missing item 4; both conventions are supported:
    # unset = only upscale when smaller than the crop (round-1 behavior),
    # set = resize every training image to (resize_height, resize_width)
    # first, like torchvision Resize + RandomCrop).
    resize_height: int | None = None
    resize_width: int | None = None
    # Val/test-image shaping convention — an UNVERIFIED reference assumption
    # (docs/PARITY.md "eval resolution"): "resize" = squash to crop_hw
    # (default, what the parity oracle uses too); "center_crop" =
    # torchvision Resize+CenterCrop semantics (escape hatch); "tile" =
    # sliding-window eval on a fixed (resize_height, resize_width) canvas
    # with 50%-overlap crop-size windows and logit averaging
    # (cyclegan_tpu.eval_tile — beyond the reference, for scoring
    # high-resolution corpora with a crop-trained net).
    eval_resize: str = "resize"
    # Horizontal-flip test-time augmentation (beyond the reference):
    # validation/--testing logits are averaged with the mirrored logits of
    # the flipped image before the argmax (cyclegan_tpu.tta). Composes
    # with eval_resize=tile. 2x eval compute.
    eval_flip: bool = False
    # Multi-scale TTA (beyond the reference): comma-separated scales, e.g.
    # "0.75,1.0,1.25" — logits computed at each scale are resized back and
    # averaged (the PSPNet/DeepLab eval protocol; cyclegan_tpu.tta
    # .scale_avg). Composes with eval_flip (average over scales x mirror)
    # and eval_resize=tile. None = off.
    eval_scales: str | None = None
    dataset_size: int | None = None   # subset (e.g. 100-image VOC config 1)

    # precision / parallelism
    bf16: bool = True                  # bf16 compute, fp32 params
    # Multi-step scan batching: compile K train steps into ONE device
    # program (lax.scan) — amortizes launch/dispatch and cross-step
    # scheduling at small batch (docs/KERNELS.md round-3). 1 = off.
    steps_per_call: int = 1
    # Gradient accumulation: ONE optimizer update from K stacked
    # microbatches (lax.scan) — effective batch K*batch_size at a single
    # microbatch's activation memory, the lever for batches whose
    # backward-pass temporaries overflow HBM into XLA's remat regime
    # (BASELINE.md b32 attribution). Mutually exclusive with
    # steps_per_call. 1 = off.
    grad_accum: int = 1
    remat: bool = False                # rematerialize generator trunks
    num_devices: int | None = None     # None = all visible
    spatial_shards: int = 1            # spatial (H) partitioning factor
    # multi-host (fleet) DP — docs/MULTIHOST.md; all three set => one JAX
    # process per host over a global mesh (jax.distributed)
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None

    # io
    checkpoint_dir: str = "./checkpoints"
    results_dir: str = "./results"
    # Keep the best-val-mIoU checkpoint under <checkpoint_dir>/best (beyond
    # the reference, which only keeps the latest): point --testing/--export
    # at it with --checkpoint_dir <dir>/best. The best score survives
    # restarts via <checkpoint_dir>/best_metric.json.
    keep_best: bool = False
    validation_every: int = 1          # epochs
    log_every: int = 20                # steps
    # Preemption-safe mid-epoch checkpointing (beyond the reference's
    # per-epoch saves): every N optimizer steps save a step-keyed
    # checkpoint under <checkpoint_dir>/mid and install a SIGTERM handler
    # that saves one final mid-checkpoint before exiting. Resume restarts
    # mid-epoch at the exact batch position (the loader's per-(seed,
    # epoch, position) RNG makes the resumed stream bit-identical to an
    # uninterrupted run — tests/test_preempt_resume.py). 0 = off.
    save_every_steps: int = 0

    # observability (SURVEY.md §5 — absent in the reference)
    profile_dir: str | None = None     # jax.profiler trace target
    debug_nans: bool = False

    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def crop_hw(self) -> tuple[int, int]:
        return (self.crop_height, self.crop_width)


# The five benchmark configs from BASELINE.json.
PRESETS: dict[str, Config] = {
    # 1. VOC2012 100-image subset, 128x128, supervised-only CE, ResNet-6, batch 2
    "voc_supervised_128": Config(
        gen_net="resnet_6blocks", dataset="voc2012", dataset_size=100,
        crop_height=128, crop_width=128, batch_size=2, epochs=100, decay_epoch=50,
    ),
    # 2. VOC2012 256x256 full semi-sup CycleGAN, ResNet-9 + PatchGAN, 1/8 labeled
    "voc_semisup_256": Config(
        gen_net="resnet_9blocks", dataset="voc2012",
        crop_height=256, crop_width=256, labeled_fraction=0.125,
    ),
    # 3. Cityscapes 512x256 semi-sup with pool replay + LR-lambda decay.
    # remat off: at the preset's batch 1 the step fits HBM and recompute is
    # pure cost (measured 12.65 vs 11.44 steps/s, round-3 A/B). Pass
    # --remat/--batch-scaled HBM relief only when batch*crop pushes temps
    # past the 16 GB HBM (see BASELINE.md b32 attribution).
    "cityscapes_semisup_512x256": Config(
        gen_net="resnet_9blocks", dataset="cityscapes",
        crop_height=256, crop_width=512,
    ),
    # 4. ACDC cardiac MRI, 1-channel, 4-class
    "acdc_semisup": Config(
        gen_net="resnet_9blocks", dataset="acdc",
        crop_height=256, crop_width=256,
    ),
    # 5. VOC2012 DP on v5e-8, global batch 64, bf16
    "voc_dp8_bf16": Config(
        gen_net="resnet_9blocks", dataset="voc2012",
        crop_height=256, crop_width=256, batch_size=64, bf16=True, num_devices=8,
    ),
}


def preset(name: str) -> Config:
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r} (have {sorted(PRESETS)})")
    return PRESETS[name]
