"""Shared torch<->jax weight-injection and pair-construction helpers for
parity tests and tools (single copy of the injection protocol — a change
to it must not be applied in N places or the parity drives silently test
different setups)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch


def conv_w(t):  # OIHW -> HWIO
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def deconv_w(t):  # (I, O, kH, kW) -> HWIO
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 0, 1))


def bias(t):
    return jnp.asarray(t.detach().numpy())


def torch_convs(module):
    """All conv/convtranspose layers of a torch model, in forward order."""
    return [m for m in module.modules()
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d))]


def _merge(old: dict, name: str, conv) -> dict:
    """Conv weights from torch, everything else (e.g. BatchNorm affine
    params under norm=batch) preserved from the flax tree."""
    w = deconv_w(conv.weight) if isinstance(conv, torch.nn.ConvTranspose2d) \
        else conv_w(conv.weight)
    return {**old.get(name, {}), "kernel": w, "bias": bias(conv.bias)}


def inject_resnet_gen(params, tmodel, n_blocks):
    """Overwrite Flax ResnetGenerator conv weights with a torch ResnetG's
    (non-conv collections — BN affine/batch_stats — are preserved; both
    frameworks initialize them identically)."""
    convs = torch_convs(tmodel)
    p = jax.tree.map(lambda x: x, params)["params"]
    new = dict(p)
    i = 0
    for name in ["ConvBlock_0", "ConvBlock_1", "ConvBlock_2"]:
        new[name] = _merge(p, name, convs[i])
        i += 1
    for b in range(n_blocks):
        rb = dict(p.get(f"ResidualBlock_{b}", {}))
        for j in range(2):
            rb[f"ConvBlock_{j}"] = _merge(rb, f"ConvBlock_{j}", convs[i])
            i += 1
        new[f"ResidualBlock_{b}"] = rb
    for d in range(2):
        new[f"DeconvBlock_{d}"] = _merge(p, f"DeconvBlock_{d}", convs[i])
        i += 1
    new["ConvBlock_3"] = _merge(p, "ConvBlock_3", convs[i])
    i += 1
    assert i == len(convs)
    return {**params, "params": new}


def inject_patchgan(params, tmodel):
    convs = torch_convs(tmodel)
    p = params["params"]
    new = {}
    for k, c in enumerate(convs):
        new[f"ConvBlock_{k}"] = _merge(p, f"ConvBlock_{k}", c)
    assert len(convs) == len(p)
    return {**params, "params": new}


def inject_pixeld(params, tmodel):
    """Overwrite Flax PixelDiscriminator conv weights with a torch PixelD's."""
    convs = [m for m in tmodel.net if isinstance(m, torch.nn.Conv2d)]
    p = params["params"]
    new = {f"ConvBlock_{k}": _merge(p, f"ConvBlock_{k}", c)
           for k, c in enumerate(convs)}
    assert len(convs) == len(p)
    return {**params, "params": new}


def make_cyclegan_pair(*, n_classes=5, size=32, ngf=8, ndf=None, n_blocks=2,
                       channels=3, gen_net="resnet", dis_net="patch",
                       norm="instance", num_downs=None, pool_size=0,
                       batch_size=1, epochs=10_000, decay_epoch=5_000,
                       steps_per_epoch=1, lamda=10.0, seed=0, bf16=False):
    """Identically-initialized cross-framework semi-sup CycleGAN pair.

    Returns ``(tmodels, t_opts, trainer, state)``: torch nets in the order
    (G_i2l, G_l2i, D_img, D_lab) with their two Adam optimizers, and the
    jax ``CycleGANTrainer`` whose state has the torch weights injected and
    both optax states freshly initialized on the injected params.
    ``torch.manual_seed(seed)`` plus the fixed construction order pins the
    init; the trainer's own PRNGKey(0) init is fully overwritten.
    """
    import itertools

    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config
    from tools.torch_reference import PatchD, PixelD, ResnetG, UnetG

    ndf = ngf if ndf is None else ndf
    tnorm = torch.nn.BatchNorm2d if norm == "batch" \
        else torch.nn.InstanceNorm2d
    torch.manual_seed(seed)
    if gen_net == "unet":
        downs = num_downs if num_downs is not None else int(np.log2(size))
        tgens = (UnetG(channels, n_classes, num_downs=downs, ngf=ngf,
                       tanh=False),
                 UnetG(n_classes, channels, num_downs=downs, ngf=ngf,
                       tanh=True))
    else:
        tgens = (ResnetG(channels, n_classes, ngf, n_blocks, tanh=False,
                         norm=tnorm),
                 ResnetG(n_classes, channels, ngf, n_blocks, tanh=True,
                         norm=tnorm))
    if dis_net == "pixel":
        tdis = (PixelD(channels, ndf), PixelD(n_classes, ndf))
    else:
        tdis = (PatchD(channels, ndf, norm=tnorm),
                PatchD(n_classes, ndf, norm=tnorm))
    tmodels = (*tgens, *tdis)
    t_opts = (
        torch.optim.Adam(itertools.chain(tmodels[0].parameters(),
                                         tmodels[1].parameters()),
                         2e-4, betas=(0.5, 0.999)),
        torch.optim.Adam(itertools.chain(tmodels[2].parameters(),
                                         tmodels[3].parameters()),
                         2e-4, betas=(0.5, 0.999)),
    )

    cfg = Config(gen_net="resnet_6blocks" if gen_net == "resnet"
                 else "unet_128",
                 dis_net="n_layers" if dis_net == "patch" else "pixel",
                 norm=norm, ngf=ngf, ndf=ndf, bf16=bf16,
                 crop_height=size, crop_width=size, batch_size=batch_size,
                 pool_size=pool_size, epochs=epochs,
                 decay_epoch=decay_epoch, lamda=lamda)
    trainer = CycleGANTrainer(cfg, n_classes, channels,
                              steps_per_epoch=steps_per_epoch)
    if gen_net == "unet":
        trainer.G_i2l = trainer.G_i2l.clone(num_downs=downs)
        trainer.G_l2i = trainer.G_l2i.clone(num_downs=downs)
        inject_g = inject_unet
    else:
        trainer.G_i2l = trainer.G_i2l.clone(n_blocks=n_blocks)
        trainer.G_l2i = trainer.G_l2i.clone(n_blocks=n_blocks)
        inject_g = lambda p, t: inject_resnet_gen(p, t, n_blocks)  # noqa: E731
    inject_d = inject_patchgan if dis_net == "patch" else inject_pixeld
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
    return tmodels, t_opts, trainer, state


def make_fixed_batch(n_classes, size, batch=1, channels=3, seed=42):
    """One fixed batch in both frameworks' layouts: ``(torch_tuple,
    jax_dict)`` where torch_tuple = (lab_img, lab_lab, unlab_img,
    lab_onehot) in NCHW and jax_dict holds the NHWC/int32 equivalents."""
    g = torch.Generator().manual_seed(seed)
    lab_img = torch.randn(batch, channels, size, size, generator=g)
    unlab_img = torch.randn(batch, channels, size, size, generator=g)
    lab_lab = torch.randint(0, n_classes, (batch, size, size), generator=g)
    lab_oh = torch.nn.functional.one_hot(lab_lab, n_classes) \
        .permute(0, 3, 1, 2).float()
    jbatch = {
        "lab_image": jnp.asarray(lab_img.numpy().transpose(0, 2, 3, 1)),
        "lab_label": jnp.asarray(lab_lab.numpy()).astype(jnp.int32),
        "unlab_image": jnp.asarray(unlab_img.numpy().transpose(0, 2, 3, 1)),
    }
    return (lab_img, lab_lab, unlab_img, lab_oh), jbatch


def make_pool_decisions(steps, batch, pool_size, seed=7):
    """One injected (use_new, swap_idx) decision stream for BOTH
    frameworks' replay pools, shapes (steps, 2, batch) with pool axis
    order (img, lab). The draw order (uniforms then integers from one
    generator) is pinned by recorded BASELINE.md parity numbers."""
    rng = np.random.default_rng(seed)
    use_new = rng.random((steps, 2, batch)) > 0.5
    swap_idx = rng.integers(0, pool_size, (steps, 2, batch))
    return use_new, swap_idx


def _torch_unet_block_parts(block):
    from tools.torch_reference import UnetBlock

    down = up = sub = None
    for m in block.model:
        if isinstance(m, torch.nn.Conv2d) and down is None:
            down = m
        elif isinstance(m, torch.nn.ConvTranspose2d):
            up = m
        elif isinstance(m, UnetBlock):
            sub = m
    return down, up, sub


def inject_unet(params: dict, tmodel) -> dict:
    """Overwrite Flax UnetGenerator conv weights with a torch UnetG's.

    Flax registers the blocks flat on the generator in creation order
    (innermost = _UnetBlock_0 ... outermost = last); torch nests outermost
    down. Walk the torch nesting and assign by reversed index."""
    n = len([k for k in params["params"] if k.startswith("_UnetBlock")])
    new = dict(params["params"])
    tblock, depth = tmodel.model, 0
    while tblock is not None:
        down, up, sub = _torch_unet_block_parts(tblock)
        name = f"_UnetBlock_{n - 1 - depth}"
        new[name] = {
            **new.get(name, {}),
            "down_kernel": conv_w(down.weight), "down_bias": bias(down.bias),
            "up_kernel": deconv_w(up.weight), "up_bias": bias(up.bias),
        }
        tblock, depth = sub, depth + 1
    assert depth == n
    return {**params, "params": new}
