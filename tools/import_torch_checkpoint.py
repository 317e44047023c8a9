"""Import a reference-style torch checkpoint into this framework's format.

The reference saves one ``latest.ckpt`` dict: epoch + 4 net state-dicts
(Gab/Gba/Da/Db) + 2 optimizer state-dicts (SURVEY.md §3e). This tool converts
the four net state-dicts into our NHWC/HWIO Flax param pytrees, maps the two
Adam state-dicts (exp_avg / exp_avg_sq / step) onto the optax states with
the same layout transposes, and writes an Orbax checkpoint that
``--training`` auto-resumes from. When the checkpoint carries no optimizer
state the moments are re-initialized (and it says so).

Usage:
  python tools/import_torch_checkpoint.py latest.ckpt ./checkpoints \
      --num_classes 21 --in_channels 3 --gen_net resnet_9blocks [--size 256]

Key layout conventions handled:
  torch Conv2d      (O, I, kH, kW) -> HWIO
  torch ConvTranspose2d (I, O, kH, kW) -> HWIO
State-dict key order is used (torch preserves registration order = forward
order), so this works for any Sequential-style naming.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _conv_entries(state_dict):
    """(key, weight, bias, is_transpose) per conv layer, in forward order."""
    out = []
    for k in state_dict:
        if not k.endswith(".weight"):
            continue
        w = state_dict[k]
        if w.ndim != 4:
            continue  # norm affine weights etc.
        b = state_dict.get(k[:-7] + ".bias")
        out.append((k, np.asarray(w), np.asarray(b) if b is not None else None))
    return out


def _to_hwio(w: np.ndarray, transpose_conv: bool) -> np.ndarray:
    if transpose_conv:
        return w.transpose(2, 3, 0, 1)  # (I,O,kH,kW) -> HWIO
    return w.transpose(2, 3, 1, 0)      # (O,I,kH,kW) -> HWIO


_GEN_ORDER = (["ConvBlock_0", "ConvBlock_1", "ConvBlock_2"]
              + [f"ResidualBlock_{i}" for i in range(16)]
              + ["DeconvBlock_0", "DeconvBlock_1", "ConvBlock_3"])


def _leaf_paths(params) -> list[tuple]:
    """Kernel param paths of a Flax tree, sorted into forward order.

    Generators (trees containing DeconvBlock) use the ResNet-generator layer
    order where the head ConvBlock_3 comes last; discriminators are plain
    numeric ConvBlock_N order.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    kernels = [(p, v) for p, v in flat if p[-1].key == "kernel"]
    is_generator = any(
        any(getattr(k, "key", "").startswith("DeconvBlock") for k in p)
        for p, _ in kernels)

    def name_key(n: str):
        if is_generator and n in _GEN_ORDER:
            return _GEN_ORDER.index(n)
        if "_" in n and n.rsplit("_", 1)[1].isdigit():
            return int(n.rsplit("_", 1)[1])
        return 0

    return sorted(kernels,
                  key=lambda item: [name_key(getattr(k, "key", str(k)))
                                    for k in item[0]])


def import_net(torch_sd: dict, jax_params, *, has_deconv: bool = True):
    """Map torch conv weights onto a Flax param tree by forward order."""
    entries = _conv_entries(torch_sd)
    paths = _leaf_paths(jax_params)
    if len(entries) != len(paths):
        raise ValueError(
            f"conv count mismatch: torch has {len(entries)}, flax expects "
            f"{len(paths)} — wrong --gen_net/--num_classes?")
    params = jax.tree.map(lambda x: x, jax_params)  # copy

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k.key]
        node[path[-1].key] = value

    import jax.numpy as jnp

    for (kname, w, b), (path, old_kernel) in zip(entries, paths):
        # Path-based layout pick: Deconv blocks hold ConvTranspose2d weights
        # ((I,O,kH,kW)); everything else is Conv2d ((O,I,kH,kW)). Shape-based
        # disambiguation alone is ambiguous for square kernels with
        # in_ch == out_ch, so try the path-implied transpose FIRST and only
        # fall back to the other order on a shape mismatch.
        is_deconv = has_deconv and any(
            "Deconv" in getattr(k, "key", "") for k in path)
        cand = _to_hwio(w, is_deconv)
        if cand.shape != old_kernel.shape:
            cand = _to_hwio(w, not is_deconv)
        if cand.shape != old_kernel.shape:
            raise ValueError(f"{kname}: shape {w.shape} fits neither conv nor "
                             f"deconv layout for {old_kernel.shape}")
        set_in(params, path, jnp.asarray(cand))
        if b is not None:
            bias_path = list(path[:-1])
            node = params
            for k in bias_path:
                node = node[k.key]
            node["bias"] = jnp.asarray(b)
    return params


def import_adam_moments(torch_opt_sd: dict, net_sds: list, jax_trees: list,
                        opt_state):
    """Map a torch ``optim.Adam.state_dict()`` onto the optax
    ``chain(scale_by_adam, scale_by_learning_rate)`` state.

    torch's per-param state ids follow the order params were handed to the
    optimizer — ``chain(netA.parameters(), netB.parameters())`` in the
    reference — which is registration order: each conv's weight then bias
    (instance norm is affine-free, so convs are the only params). The
    ``exp_avg``/``exp_avg_sq`` tensors get the SAME OIHW->HWIO transposes
    as their weights; the shared step counter seeds both optax counts (the
    LR staircase therefore resumes at the right decay position).

    Returns the new opt_state; raises on count mismatches.
    """
    import jax.numpy as jnp

    state_map = torch_opt_sd["state"]
    mus, nus = [], []
    idx = 0
    step = 0

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k.key]
        node[path[-1].key] = value

    for sd, jt in zip(net_sds, jax_trees):
        entries = _conv_entries(sd)
        paths = _leaf_paths(jt)
        if len(entries) != len(paths):
            raise ValueError("conv count mismatch in optimizer import")
        mu = jax.tree.map(jnp.zeros_like, jt)
        nu = jax.tree.map(jnp.zeros_like, jt)
        for (kname, w, b), (path, old_kernel) in zip(entries, paths):
            is_deconv = any("Deconv" in getattr(k, "key", "") for k in path)
            st = state_map.get(idx, None)
            if st is not None:
                step = max(step, int(st["step"]))
                for field, tree in (("exp_avg", mu), ("exp_avg_sq", nu)):
                    m = np.asarray(st[field])
                    cand = _to_hwio(m, is_deconv)
                    if cand.shape != old_kernel.shape:
                        cand = _to_hwio(m, not is_deconv)
                    set_in(tree, path, jnp.asarray(cand))
            idx += 1
            if b is not None:
                st = state_map.get(idx, None)
                if st is not None:
                    bias_path = list(path[:-1])
                    for field, tree in (("exp_avg", mu), ("exp_avg_sq", nu)):
                        node = tree
                        for k in bias_path:
                            node = node[k.key]
                        node["bias"] = jnp.asarray(np.asarray(st[field]))
                idx += 1
        mus.append(mu)
        nus.append(nu)

    # CycleGAN optimizers run over a TUPLE of net trees (mu is a tuple);
    # the supervised optimizer runs over one params tree directly.
    single = not isinstance(opt_state[0].mu, tuple)
    if single and len(mus) != 1:
        raise ValueError("single-tree optimizer state but multiple nets")
    adam = opt_state[0]._replace(
        count=jnp.asarray(step, jnp.int32),
        mu=mus[0] if single else tuple(mus),
        nu=nus[0] if single else tuple(nus))
    rest = list(opt_state[1:])
    for i, s in enumerate(rest):
        if hasattr(s, "count"):
            rest[i] = s._replace(count=jnp.asarray(step, jnp.int32))
    return (adam, *rest)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--num_classes", type=int, default=21)
    ap.add_argument("--in_channels", type=int, default=3)
    ap.add_argument("--gen_net", default="resnet_9blocks")
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--epoch", type=int, default=None,
                    help="override the epoch stored in the checkpoint")
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

    import torch

    from cyclegan_tpu.train.checkpoint import CheckpointManager
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.train.supervised import SupervisedTrainer
    from cyclegan_tpu.utils.config import Config

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    cfg = Config(gen_net=args.gen_net, ngf=args.ngf, ndf=args.ndf,
                 crop_height=args.size, crop_width=args.size, bf16=False)

    # Accept both {'Gab': sd, ...} naming and positional lists.
    def find(*names):
        for n in names:
            if n in ckpt:
                return ckpt[n]
        raise KeyError(f"none of {names} in checkpoint keys {list(ckpt)}")

    if args.model == "supervised":
        trainer = SupervisedTrainer(cfg, args.num_classes, args.in_channels,
                                    steps_per_epoch=1)
        state = trainer.init_state(jax.random.PRNGKey(0))
        sd = find("Gsi", "model", "net", "G", "state_dict")
        state = state._replace(params=import_net(sd, state.params))
        opt_sd = next((ckpt[k] for k in ("g_optimizer", "optimizer", "opt")
                       if k in ckpt), None)
        if opt_sd is not None:
            state = state._replace(opt_state=import_adam_moments(
                opt_sd, [sd], [state.params], state.opt_state))
            print("imported optimizer moments")
        else:
            print("no optimizer state in checkpoint; moments re-initialized")
        epoch = args.epoch if args.epoch is not None \
            else int(ckpt.get("epoch", 0))
        mngr = CheckpointManager(args.out_dir)
        mngr.save(epoch, jax.device_get(state))
        mngr.wait()
        mngr.close()
        print(f"imported -> {args.out_dir} (supervised, epoch {epoch})")
        return

    trainer = CycleGANTrainer(cfg, args.num_classes, args.in_channels,
                              steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))

    g_i2l_sd = find("Gsi", "Gab", "G_A", "netG_A")
    g_l2i_sd = find("Gis", "Gba", "G_B", "netG_B")
    d_img_sd = find("Di", "Da", "D_A", "netD_A")
    d_lab_sd = find("Ds", "Db", "D_B", "netD_B")
    state = state._replace(
        g_i2l=import_net(g_i2l_sd, state.g_i2l),
        g_l2i=import_net(g_l2i_sd, state.g_l2i),
        d_img=import_net(d_img_sd, state.d_img),
        d_lab=import_net(d_lab_sd, state.d_lab),
    )
    # Optimizer moments (reference saves 2 Adam state-dicts — SURVEY.md §3e;
    # param order in each = chain(netA.parameters(), netB.parameters())).
    for keys, sds, trees, attr, tx_state in (
        (("g_optimizer", "g_opt", "optimizer_G"), (g_i2l_sd, g_l2i_sd),
         (state.g_i2l, state.g_l2i), "g_opt", state.g_opt),
        (("d_optimizer", "d_opt", "optimizer_D"), (d_img_sd, d_lab_sd),
         (state.d_img, state.d_lab), "d_opt", state.d_opt),
    ):
        opt_sd = next((ckpt[k] for k in keys if k in ckpt), None)
        if opt_sd is not None:
            state = state._replace(**{attr: import_adam_moments(
                opt_sd, list(sds), list(trees), tx_state)})
            print(f"imported optimizer moments for {attr}")
        else:
            print(f"no optimizer state for {attr} in checkpoint "
                  f"(looked for {keys}); moments re-initialized")
    epoch = args.epoch if args.epoch is not None else int(ckpt.get("epoch", 0))
    mngr = CheckpointManager(args.out_dir)
    mngr.save(epoch, jax.device_get(state))
    mngr.wait()
    mngr.close()
    print(f"imported -> {args.out_dir} (epoch {epoch})")


if __name__ == "__main__":
    main()
