"""Shared torch<->jax weight-injection helpers for parity tests."""

import jax
import jax.numpy as jnp
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
