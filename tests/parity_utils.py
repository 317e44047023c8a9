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


def inject_resnet_gen(params, tmodel, n_blocks):
    """Overwrite Flax ResnetGenerator params with a torch ResnetG's weights."""
    convs = torch_convs(tmodel)
    p = jax.tree.map(lambda x: x, params)["params"]
    new = dict(p)
    i = 0
    for name in ["ConvBlock_0", "ConvBlock_1", "ConvBlock_2"]:
        new[name] = {"kernel": conv_w(convs[i].weight), "bias": bias(convs[i].bias)}
        i += 1
    for b in range(n_blocks):
        rb = {}
        for j in range(2):
            rb[f"ConvBlock_{j}"] = {"kernel": conv_w(convs[i].weight),
                                    "bias": bias(convs[i].bias)}
            i += 1
        new[f"ResidualBlock_{b}"] = rb
    for d in range(2):
        new[f"DeconvBlock_{d}"] = {"kernel": deconv_w(convs[i].weight),
                                   "bias": bias(convs[i].bias)}
        i += 1
    new["ConvBlock_3"] = {"kernel": conv_w(convs[i].weight),
                          "bias": bias(convs[i].bias)}
    i += 1
    assert i == len(convs)
    return {"params": new}


def inject_patchgan(params, tmodel):
    convs = torch_convs(tmodel)
    new = {}
    for k, c in enumerate(convs):
        new[f"ConvBlock_{k}"] = {"kernel": conv_w(c.weight), "bias": bias(c.bias)}
    assert len(convs) == len(params["params"])
    return {"params": new}
