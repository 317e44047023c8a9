"""Export this framework's checkpoint to a reference-style torch checkpoint.

The inverse of tools/import_torch_checkpoint.py — completes the migration
story in both directions: a user can train here (TPU) and hand the result
back to a PyTorch fleet, or round-trip a checkpoint for A/B comparisons.
The output is one ``latest.ckpt``-style dict (SURVEY.md §3e): epoch + 4 net
state-dicts (keyed Gsi/Gis/Di/Ds, the names the importer also accepts) + 2
Adam optimizer state-dicts whose exp_avg/exp_avg_sq carry the same layout
transposes as the weights, so torch training RESUMES (not just infers) from
the exported state.

Usage:
  python tools/export_torch_checkpoint.py ./checkpoints latest.ckpt \
      --dataset voc2012 --gen_net resnet_9blocks [--ngf 64 --ndf 64 ...]

Layout conventions (inverse of the importer's):
  HWIO -> torch Conv2d      (O, I, kH, kW)
  HWIO -> torch ConvTranspose2d (I, O, kH, kW)
Mapping is by forward order on both sides (torch state-dict key order =
registration order; flax paths sorted by tools.import_torch_checkpoint's
``_leaf_paths``), so any Sequential-style torch naming works. Instance-norm
(affine-free) models only — the reference's default; ``--norm batch``
checkpoints carry running stats this tool does not map.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.import_torch_checkpoint import (  # noqa: E402
    _conv_entries, _leaf_paths)


def _from_hwio(w: np.ndarray, transpose_conv: bool) -> np.ndarray:
    if transpose_conv:
        return w.transpose(2, 3, 0, 1)  # HWIO -> (I,O,kH,kW)
    return w.transpose(3, 2, 0, 1)      # HWIO -> (O,I,kH,kW)


def _get_in(tree, path):
    node = tree
    for k in path:
        node = node[k.key]
    return node


def export_net(jax_params, torch_sd: dict) -> dict:
    """Write a Flax param tree's convs into a torch state-dict (returns a
    new dict; forward-order pairing, shape-checked transposes)."""
    import torch

    entries = _conv_entries(torch_sd)
    paths = _leaf_paths(jax_params)
    if len(entries) != len(paths):
        raise ValueError(
            f"conv count mismatch: torch expects {len(entries)}, flax has "
            f"{len(paths)} — wrong --gen_net/--num_classes?")
    out = dict(torch_sd)
    for (kname, w_t, b_t), (path, kernel) in zip(entries, paths):
        w = np.asarray(kernel)
        is_deconv = any("Deconv" in getattr(k, "key", "") for k in path)
        cand = _from_hwio(w, is_deconv)
        if cand.shape != tuple(w_t.shape):
            cand = _from_hwio(w, not is_deconv)
        if cand.shape != tuple(w_t.shape):
            raise ValueError(f"{kname}: flax kernel {w.shape} fits neither "
                             f"conv nor deconv layout for {tuple(w_t.shape)}")
        out[kname] = torch.from_numpy(np.ascontiguousarray(cand))
        if b_t is not None:
            parent = _get_in(jax_params, path[:-1])
            if "bias" not in parent:
                raise ValueError(f"{kname}: torch expects a bias, flax "
                                 "param has none")
            out[kname[:-7] + ".bias"] = torch.from_numpy(
                np.ascontiguousarray(np.asarray(parent["bias"])))
    return out


def export_adam_moments(opt_state, jax_trees: list, torch_sds: list,
                        torch_opt_sd: dict) -> dict:
    """Fill a torch ``optim.Adam.state_dict()`` skeleton from the optax
    ``chain(scale_by_adam, scale_by_learning_rate)`` state.

    Per-param ids follow torch registration order (each conv's weight then
    bias), matching the reference's ``Adam(chain(netA, netB).parameters())``
    — the exact inverse of the importer's ``import_adam_moments``.
    """
    import torch

    adam = opt_state[0]
    step = int(np.asarray(jax.device_get(adam.count)))
    out = {"param_groups": [dict(g) for g in torch_opt_sd["param_groups"]],
           "state": {}}
    idx = 0
    for net_i, (tree, sd) in enumerate(zip(jax_trees, torch_sds)):
        entries = _conv_entries(sd)
        paths = _leaf_paths(tree)
        if len(entries) != len(paths):
            raise ValueError("conv count mismatch in optimizer export")
        # CycleGAN optimizers: mu is a tuple of per-net trees; the
        # supervised optimizer holds the single params tree directly.
        if isinstance(adam.mu, tuple):
            mu_tree, nu_tree = adam.mu[net_i], adam.nu[net_i]
        else:
            mu_tree, nu_tree = adam.mu, adam.nu
        for (kname, w_t, b_t), (path, kernel) in zip(entries, paths):
            is_deconv = any("Deconv" in getattr(k, "key", "") for k in path)
            st = {"step": torch.tensor(float(step))}
            for field, tree_m in (("exp_avg", mu_tree), ("exp_avg_sq", nu_tree)):
                m = np.asarray(_get_in(tree_m, path))
                cand = _from_hwio(m, is_deconv)
                if cand.shape != tuple(w_t.shape):
                    cand = _from_hwio(m, not is_deconv)
                if cand.shape != tuple(w_t.shape):
                    raise ValueError(
                        f"{kname} {field}: moment {m.shape} fits neither "
                        f"conv nor deconv layout for {tuple(w_t.shape)}")
                st[field] = torch.from_numpy(np.ascontiguousarray(cand))
            out["state"][idx] = st
            idx += 1
            if b_t is not None:
                parent_mu = _get_in(mu_tree, path[:-1])
                parent_nu = _get_in(nu_tree, path[:-1])
                out["state"][idx] = {
                    "step": torch.tensor(float(step)),
                    "exp_avg": torch.from_numpy(
                        np.ascontiguousarray(np.asarray(parent_mu["bias"]))),
                    "exp_avg_sq": torch.from_numpy(
                        np.ascontiguousarray(np.asarray(parent_nu["bias"]))),
                }
                idx += 1
    return out


def export_checkpoint(state, out_path: str, *, num_classes: int,
                      in_channels: int, ngf: int, ndf: int, n_blocks: int,
                      epoch: int = 0) -> None:
    """state -> reference-style ``latest.ckpt`` (torch.save dict)."""
    import itertools

    import torch

    from tools.torch_reference import build

    G_i2l, G_l2i, D_img, D_lab = build(num_classes, in_channels, ngf, ndf,
                                       n_blocks)
    sds = {
        "Gsi": export_net(state.g_i2l, G_i2l.state_dict()),
        "Gis": export_net(state.g_l2i, G_l2i.state_dict()),
        "Di": export_net(state.d_img, D_img.state_dict()),
        "Ds": export_net(state.d_lab, D_lab.state_dict()),
    }
    g_opt_t = torch.optim.Adam(
        itertools.chain(G_i2l.parameters(), G_l2i.parameters()),
        lr=2e-4, betas=(0.5, 0.999))
    d_opt_t = torch.optim.Adam(
        itertools.chain(D_img.parameters(), D_lab.parameters()),
        lr=2e-4, betas=(0.5, 0.999))
    ckpt = dict(sds)
    ckpt["epoch"] = epoch
    ckpt["g_optimizer"] = export_adam_moments(
        state.g_opt, [state.g_i2l, state.g_l2i],
        [sds["Gsi"], sds["Gis"]], g_opt_t.state_dict())
    ckpt["d_optimizer"] = export_adam_moments(
        state.d_opt, [state.d_img, state.d_lab],
        [sds["Di"], sds["Ds"]], d_opt_t.state_dict())
    torch.save(ckpt, out_path)


def export_supervised_checkpoint(state, out_path: str, *, num_classes: int,
                                 in_channels: int, ngf: int, n_blocks: int,
                                 epoch: int = 0) -> None:
    """Supervised state -> single-net torch checkpoint (``Gsi`` = the seg
    net, raw-logits head; ``g_optimizer`` = its Adam state). The importer's
    ``--model supervised`` reads it back."""
    import torch

    from tools.torch_reference import ResnetG

    G = ResnetG(in_channels, num_classes, ngf, n_blocks, tanh=False)
    sd = export_net(state.params, G.state_dict())
    opt_t = torch.optim.Adam(G.parameters(), lr=2e-4, betas=(0.5, 0.999))
    ckpt = {
        "epoch": epoch,
        "Gsi": sd,
        "g_optimizer": export_adam_moments(
            state.opt_state, [state.params], [sd], opt_t.state_dict()),
    }
    torch.save(ckpt, out_path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir")
    ap.add_argument("out_ckpt")
    ap.add_argument("--dataset", default="voc2012")
    ap.add_argument("--gen_net", default="resnet_9blocks")
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--num_classes", type=int, default=None,
                    help="override the dataset spec's class count (for "
                         "checkpoints trained at non-default num_classes)")
    ap.add_argument("--in_channels", type=int, default=None)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu: this is a host-side "
                         "migration tool; the env's sitecustomize would "
                         "otherwise route jax at the flaky TPU tunnel)")
    ap.add_argument("--model", choices=["supervised", "semisupervised"],
                    default="semisupervised",
                    help="checkpoint kind: semisupervised = 4 nets + 2 Adam "
                         "states; supervised = the single seg net + its "
                         "Adam state")
    args = ap.parse_args()

    jax.config.update("jax_platforms", args.platform)

    from cyclegan_tpu.train.checkpoint import (CheckpointManager,
                                               restore_for_inference)
    from cyclegan_tpu.utils.config import Config

    if not args.gen_net.startswith("resnet"):
        raise SystemExit("torch export maps the ResNet generator families "
                         "(resnet_6blocks / resnet_9blocks)")
    n_blocks = 9 if args.gen_net == "resnet_9blocks" else 6
    cfg = Config(dataset=args.dataset, gen_net=args.gen_net, ngf=args.ngf,
                 ndf=args.ndf, crop_height=args.size, crop_width=args.size,
                 bf16=False, checkpoint_dir=args.checkpoint_dir)
    semisup = args.model == "semisupervised"
    trainer, state, num_classes, in_ch = restore_for_inference(
        cfg, semisupervised=semisup, num_classes=args.num_classes,
        in_channels=args.in_channels)
    mngr = CheckpointManager(cfg.checkpoint_dir)
    epoch = int(mngr.latest_epoch() or 0)  # the ckpt key IS the epoch
    mngr.close()
    if semisup:
        export_checkpoint(state, args.out_ckpt,
                          num_classes=num_classes, in_channels=in_ch,
                          ngf=args.ngf, ndf=args.ndf, n_blocks=n_blocks,
                          epoch=epoch)
        print(f"exported -> {args.out_ckpt} (torch latest.ckpt format, "
              f"4 nets + 2 Adam states)")
    else:
        export_supervised_checkpoint(
            state, args.out_ckpt, num_classes=num_classes,
            in_channels=in_ch, ngf=args.ngf, n_blocks=n_blocks, epoch=epoch)
        print(f"exported -> {args.out_ckpt} (torch supervised format, "
              f"1 net + 1 Adam state)")


if __name__ == "__main__":
    main()
