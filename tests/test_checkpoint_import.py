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


def test_import_adam_moments_roundtrip():
    """Optimizer moments transfer: run 3 torch Adam steps, import, and the
    optax mu/nu + counts must equal the torch exp_avg/exp_avg_sq/step
    (with the weight-layout transposes)."""
    from tools.import_torch_checkpoint import import_adam_moments

    torch.manual_seed(2)
    n_classes, ngf = 4, 8
    G_a = ResnetG(3, n_classes, ngf, 6, tanh=False)
    G_b = ResnetG(n_classes, 3, ngf, 6, tanh=True)
    opt = torch.optim.Adam(
        list(G_a.parameters()) + list(G_b.parameters()),
        lr=2e-4, betas=(0.5, 0.999))
    for _ in range(3):
        x = torch.randn(1, 3, 32, 32)
        oh = torch.randn(1, n_classes, 32, 32)
        loss = G_a(x).square().mean() + G_b(oh).square().mean()
        opt.zero_grad(); loss.backward(); opt.step()

    cfg = Config(gen_net="resnet_6blocks", ngf=ngf, ndf=8, bf16=False,
                 crop_height=32, crop_width=32)
    trainer = CycleGANTrainer(cfg, n_classes, 3, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))

    new_opt = import_adam_moments(
        opt.state_dict(), [G_a.state_dict(), G_b.state_dict()],
        [state.g_i2l, state.g_l2i], state.g_opt)
    adam = new_opt[0]
    assert int(adam.count) == 3
    # first conv weight of G_a: torch param id 0
    st0 = opt.state_dict()["state"][0]
    mu_leaf = jax.tree_util.tree_flatten_with_path(adam.mu[0])[0]
    kernels = [(p, v) for p, v in mu_leaf if p[-1].key == "kernel"]
    # match by shape to the (7,7,3,ngf) stem kernel
    want = np.asarray(st0["exp_avg"]).transpose(2, 3, 1, 0)
    got = next(np.asarray(v) for p, v in kernels if v.shape == want.shape)
    np.testing.assert_allclose(got, want, atol=1e-7)
    # nu strictly positive where gradients flowed
    nu0 = next(np.asarray(v) for p, v in
               jax.tree_util.tree_flatten_with_path(adam.nu[0])[0]
               if v.shape == want.shape)
    assert (nu0 >= 0).all() and nu0.max() > 0
