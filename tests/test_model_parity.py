"""Full-model torch parity: inject identical weights into the Flax models and
the torch reference-semantics models (tools/torch_reference.py) and compare
outputs (SURVEY.md §4 "Unit" — same weights both ways, ~1e-5 fp32, plus the
PatchGAN receptive-field check)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cyclegan_tpu.models import ResnetGenerator, define_Dis  # noqa: E402
from tools.torch_reference import PatchD, ResnetG  # noqa: E402


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
    """Overwrite Flax ResnetGenerator params with the torch model's weights."""
    convs = torch_convs(tmodel)
    p = jax.tree.map(lambda x: x, params)["params"]
    order = ["ConvBlock_0", "ConvBlock_1", "ConvBlock_2"]
    new = dict(p)
    i = 0
    for name in order:
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


class TestResnetGeneratorParity:
    def test_output_matches_torch(self):
        torch.manual_seed(0)
        n_blocks, ngf = 2, 8
        tmodel = ResnetG(3, 5, ngf=ngf, n_blocks=n_blocks, tanh=True).eval()
        jmodel = ResnetGenerator(output_nc=5, ngf=ngf, n_blocks=n_blocks,
                                 head="tanh")
        x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(1))
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        params = jmodel.init(jax.random.PRNGKey(0), xj)
        params = inject_resnet_gen(params, tmodel, n_blocks)
        got = np.asarray(jmodel.apply(params, xj)).transpose(0, 3, 1, 2)
        with torch.no_grad():
            ref = tmodel(x).numpy()
        np.testing.assert_allclose(got, ref, atol=5e-5)


class TestPatchGANParity:
    def test_output_matches_torch(self):
        torch.manual_seed(2)
        tmodel = PatchD(3, ndf=8, n_layers=3).eval()
        jmodel = define_Dis(ndf=8, netD="n_layers", n_layers_D=3)
        x = torch.randn(2, 3, 70, 70, generator=torch.Generator().manual_seed(3))
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        params = jmodel.init(jax.random.PRNGKey(0), xj)
        params = inject_patchgan(params, tmodel)
        got = np.asarray(jmodel.apply(params, xj)).transpose(0, 3, 1, 2)
        with torch.no_grad():
            ref = tmodel(x).numpy()
        np.testing.assert_allclose(got, ref, atol=5e-5)

    def test_receptive_field_is_70(self):
        """Gradient of one central score cell w.r.t. the input spans exactly
        70x70 pixels (the conv-stack receptive field; norm='none' because
        instance-norm statistics couple all pixels globally)."""
        jmodel = define_Dis(ndf=8, netD="n_layers", n_layers_D=3, norm="none")
        x = jnp.zeros((1, 256, 256, 3))
        params = jmodel.init(jax.random.PRNGKey(0), x)
        out = jmodel.apply(params, x)
        cy, cx = out.shape[1] // 2, out.shape[2] // 2
        g = jax.grad(lambda xx: jmodel.apply(params, xx)[0, cy, cx, 0])(x)
        nz = np.abs(np.asarray(g))[0].sum(-1) > 0
        ys, xs = np.nonzero(nz)
        assert ys.max() - ys.min() + 1 == 70
        assert xs.max() - xs.min() + 1 == 70
