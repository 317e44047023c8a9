"""torch-checkpoint import tool: imported params reproduce the torch nets'
outputs (SURVEY.md §5 checkpoint table, 'import tool for torch .ckpt')."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cyclegan_tpu.train.cyclegan import CycleGANTrainer  # noqa: E402
from cyclegan_tpu.utils.config import Config  # noqa: E402
from tools.import_torch_checkpoint import import_net  # noqa: E402
from tools.torch_reference import PatchD, ResnetG, build  # noqa: E402


def test_import_reproduces_torch_outputs(tmp_path):
    torch.manual_seed(0)
    n_classes, ngf, ndf = 5, 8, 8
    G_i2l = ResnetG(3, n_classes, ngf, 6, tanh=False)
    G_l2i = ResnetG(n_classes, 3, ngf, 6, tanh=True)
    D_img = PatchD(3, ndf)
    D_lab = PatchD(n_classes, ndf)

    cfg = Config(gen_net="resnet_6blocks", ngf=ngf, ndf=ndf, bf16=False,
                 crop_height=32, crop_width=32)
    trainer = CycleGANTrainer(cfg, n_classes, 3, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))

    g_i2l = import_net(G_i2l.state_dict(), state.g_i2l)
    g_l2i = import_net(G_l2i.state_dict(), state.g_l2i)
    d_img = import_net(D_img.state_dict(), state.d_img)
    d_lab = import_net(D_lab.state_dict(), state.d_lab)

    x = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    with torch.no_grad():
        np.testing.assert_allclose(
            np.asarray(trainer.G_i2l.apply(g_i2l, xj)).transpose(0, 3, 1, 2),
            G_i2l(x).numpy(), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(trainer.D_img.apply(d_img, xj)).transpose(0, 3, 1, 2),
            D_img(x).numpy(), atol=5e-5)
    oh = torch.nn.functional.one_hot(
        torch.randint(0, n_classes, (1, 32, 32)), n_classes).permute(0, 3, 1, 2).float()
    ohj = jnp.asarray(oh.numpy().transpose(0, 2, 3, 1))
    with torch.no_grad():
        np.testing.assert_allclose(
            np.asarray(trainer.G_l2i.apply(g_l2i, ohj)).transpose(0, 3, 1, 2),
            G_l2i(oh).numpy(), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(trainer.D_lab.apply(d_lab, ohj)).transpose(0, 3, 1, 2),
            D_lab(oh).numpy(), atol=5e-5)
