"""U-Net generator + PixelDiscriminator torch parity (completes the model-zoo
oracle coverage — SURVEY.md §2 'UnetGenerator', 'PixelDiscriminator')."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parity_utils import inject_pixeld, inject_unet  # noqa: E402

from cyclegan_tpu.models import UnetGenerator, define_Dis  # noqa: E402
from tools.torch_reference import PixelD, UnetG  # noqa: E402


def test_unet_matches_torch():
    torch.manual_seed(0)
    ngf, downs = 4, 5  # 32x32 input -> bottleneck 1x1
    tmodel = UnetG(3, 2, num_downs=downs, ngf=ngf, tanh=True).eval()
    jmodel = UnetGenerator(output_nc=2, num_downs=downs, ngf=ngf, head="tanh")
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = jmodel.init(jax.random.PRNGKey(0), xj)
    params = inject_unet(params, tmodel)
    got = np.asarray(jmodel.apply(params, xj)).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_pixel_discriminator_matches_torch():
    torch.manual_seed(2)
    tmodel = PixelD(3, ndf=8).eval()
    jmodel = define_Dis(ndf=8, netD="pixel")
    x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(3))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = jmodel.init(jax.random.PRNGKey(0), xj)
    params = inject_pixeld(params, tmodel)
    got = np.asarray(jmodel.apply(params, xj)).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref = tmodel(x).numpy()
    np.testing.assert_allclose(got, ref, atol=5e-5)
