"""torch-checkpoint EXPORT tool (tools/export_torch_checkpoint.py) — the
inverse of the importer, completing the two-way migration story
(SURVEY.md §5 checkpoint table; docs/MIGRATION.md).

Proof obligations: exported torch nets reproduce our forward outputs;
export -> import round-trips params bitwise; exported Adam state-dicts are
load_state_dict-valid and carry our moments (with layout transposes) so
torch RESUMES training, not just inference; the CLI tool drives an Orbax
checkpoint dir end-to-end.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cyclegan_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from cyclegan_tpu.train.cyclegan import CycleGANTrainer  # noqa: E402
from cyclegan_tpu.utils.config import Config  # noqa: E402
from tools.export_torch_checkpoint import (  # noqa: E402
    export_adam_moments, export_checkpoint, export_net)
from tools.import_torch_checkpoint import (  # noqa: E402
    import_adam_moments, import_net)
from tools.torch_reference import build, train_step  # noqa: E402

H = W = 32
N_CLASSES, NGF, NDF = 5, 8, 8


def _trainer_state(seed=0, pool_size=2):
    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=NGF,
                 ndf=NDF, bf16=False, crop_height=H, crop_width=W,
                 batch_size=2, pool_size=pool_size, num_devices=1)
    trainer = CycleGANTrainer(cfg, N_CLASSES, 3, steps_per_epoch=1)
    return cfg, trainer, trainer.init_state(jax.random.PRNGKey(seed))


def _torch_nets():
    torch.manual_seed(0)
    return build(N_CLASSES, 3, NGF, NDF, 6)


def test_export_reproduces_jax_outputs():
    """The exported torch nets compute what our nets compute."""
    _, trainer, state = _trainer_state()
    G_i2l, G_l2i, D_img, D_lab = _torch_nets()
    G_i2l.load_state_dict(export_net(state.g_i2l, G_i2l.state_dict()))
    G_l2i.load_state_dict(export_net(state.g_l2i, G_l2i.state_dict()))
    D_img.load_state_dict(export_net(state.d_img, D_img.state_dict()))
    D_lab.load_state_dict(export_net(state.d_lab, D_lab.state_dict()))

    x = torch.randn(1, 3, H, W, generator=torch.Generator().manual_seed(1))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    oh = torch.nn.functional.one_hot(
        torch.randint(0, N_CLASSES, (1, H, W),
                      generator=torch.Generator().manual_seed(2)),
        N_CLASSES).permute(0, 3, 1, 2).float()
    ohj = jnp.asarray(oh.numpy().transpose(0, 2, 3, 1))
    with torch.no_grad():
        for net, params, flax_net, inp, inp_j in (
                (G_i2l, state.g_i2l, trainer.G_i2l, x, xj),
                (G_l2i, state.g_l2i, trainer.G_l2i, oh, ohj),
                (D_img, state.d_img, trainer.D_img, x, xj),
                (D_lab, state.d_lab, trainer.D_lab, oh, ohj)):
            ours = np.asarray(flax_net.apply(params, inp_j)).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, net(inp).numpy(), atol=5e-5)


def test_export_import_roundtrip_bitwise():
    """export_net -> import_net returns the original tree exactly."""
    _, _, state = _trainer_state()
    G_i2l, _, _, D_lab = _torch_nets()
    for tree, net in ((state.g_i2l, G_i2l), (state.d_lab, D_lab)):
        sd = export_net(tree, net.state_dict())
        back = import_net(sd, tree)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_adam_state_resumes_torch(tmp_path):
    """Full-checkpoint export: torch loads the 4 nets + 2 optimizers and
    takes a training step; the moments round-trip through the importer."""
    import itertools

    cfg, trainer, state = _trainer_state()
    # a couple of real steps so the moments are nonzero
    step = jax.jit(trainer.train_step)
    batch = {
        "lab_image": jnp.zeros((2, H, W, 3), jnp.float32),
        "lab_label": jnp.zeros((2, H, W), jnp.int32),
        "unlab_image": jnp.ones((2, H, W, 3), jnp.float32) * 0.1,
    }
    for _ in range(2):
        state, _ = step(state, batch)

    out = str(tmp_path / "latest.ckpt")
    export_checkpoint(state, out, num_classes=N_CLASSES,
                      in_channels=3, ngf=NGF, ndf=NDF, n_blocks=6, epoch=7)
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7
    assert set(ckpt) >= {"Gsi", "Gis", "Di", "Ds", "g_optimizer",
                         "d_optimizer"}

    # moments round-trip through the importer
    back = import_adam_moments(
        ckpt["g_optimizer"], [ckpt["Gsi"], ckpt["Gis"]],
        [state.g_i2l, state.g_l2i], state.g_opt)
    assert int(back[0].count) == int(np.asarray(state.g_opt[0].count))
    for ours, rt in zip(jax.tree.leaves(state.g_opt[0].mu),
                        jax.tree.leaves(back[0].mu)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(rt),
                                   atol=1e-7)

    # torch actually RESUMES: load nets + optimizers, run one train step
    G_i2l, G_l2i, D_img, D_lab = _torch_nets()
    G_i2l.load_state_dict(ckpt["Gsi"])
    G_l2i.load_state_dict(ckpt["Gis"])
    D_img.load_state_dict(ckpt["Di"])
    D_lab.load_state_dict(ckpt["Ds"])
    g_opt = torch.optim.Adam(
        itertools.chain(G_i2l.parameters(), G_l2i.parameters()),
        lr=2e-4, betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(
        itertools.chain(D_img.parameters(), D_lab.parameters()),
        lr=2e-4, betas=(0.5, 0.999))
    g_opt.load_state_dict(ckpt["g_optimizer"])
    d_opt.load_state_dict(ckpt["d_optimizer"])
    lab_lab = torch.randint(0, N_CLASSES, (1, H, W))
    torch_batch = (
        torch.randn(1, 3, H, W), lab_lab, torch.randn(1, 3, H, W),
        torch.nn.functional.one_hot(lab_lab, N_CLASSES)
        .permute(0, 3, 1, 2).float())
    train_step((G_i2l, G_l2i, D_img, D_lab), (g_opt, d_opt), torch_batch)
    # bias-correction continuity: step count advanced from ours, not from 0
    st0 = g_opt.state_dict()["state"][0]
    assert int(st0["step"]) == int(np.asarray(state.g_opt[0].count)) + 1


def test_supervised_export_roundtrip(tmp_path):
    """--model supervised: the single-net checkpoint reproduces our logits,
    torch's Adam resumes from our moments, and the importer reads it back
    bitwise (single-tree optimizer state)."""
    from cyclegan_tpu.train.supervised import SupervisedTrainer
    from tools.export_torch_checkpoint import export_supervised_checkpoint
    from tools.torch_reference import ResnetG

    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=NGF,
                 ndf=NDF, bf16=False, crop_height=H, crop_width=W,
                 batch_size=2, num_devices=1)
    trainer = SupervisedTrainer(cfg, N_CLASSES, 3, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_step)
    batch = {"image": jnp.ones((2, H, W, 3), jnp.float32) * 0.1,
             "label": jnp.zeros((2, H, W), jnp.int32)}
    for _ in range(2):
        state, _ = step(state, batch)

    out = str(tmp_path / "sup.ckpt")
    export_supervised_checkpoint(state, out, num_classes=N_CLASSES,
                                 in_channels=3, ngf=NGF, n_blocks=6, epoch=4)
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 4 and set(ckpt) >= {"Gsi", "g_optimizer"}

    # torch net reproduces our logits
    G = ResnetG(3, N_CLASSES, NGF, 6, tanh=False)
    G.load_state_dict(ckpt["Gsi"])
    x = torch.randn(1, 3, H, W, generator=torch.Generator().manual_seed(5))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    ours = np.asarray(trainer.logits(state.params, xj)).transpose(0, 3, 1, 2)
    with torch.no_grad():
        np.testing.assert_allclose(ours, G(x).numpy(), atol=5e-5)

    # torch resumes: optimizer loads, one CE step, step count continues
    opt = torch.optim.Adam(G.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt.load_state_dict(ckpt["g_optimizer"])
    loss = torch.nn.functional.cross_entropy(
        G(x), torch.zeros(1, H, W, dtype=torch.long))
    loss.backward()
    opt.step()
    st0 = opt.state_dict()["state"][0]
    assert int(st0["step"]) == int(np.asarray(state.opt_state[0].count)) + 1

    # round-trips through the importer's single-tree path (reload from
    # disk: opt.step() above advanced the step tensor SHARED with `ckpt`)
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    back_params = import_net(ckpt["Gsi"], state.params)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(back_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    back_opt = import_adam_moments(ckpt["g_optimizer"], [ckpt["Gsi"]],
                                   [state.params], state.opt_state)
    assert int(back_opt[0].count) == int(np.asarray(state.opt_state[0].count))
    for ours_m, rt in zip(jax.tree.leaves(state.opt_state[0].mu),
                          jax.tree.leaves(back_opt[0].mu)):
        np.testing.assert_allclose(np.asarray(ours_m), np.asarray(rt),
                                   atol=1e-7)


def test_supervised_cli_tools_end_to_end(tmp_path, monkeypatch):
    """Orbax supervised ckpt -> torch via the export tool CLI -> back to a
    fresh Orbax dir via the import tool CLI; params survive bitwise."""
    import tools.export_torch_checkpoint as exp_tool
    import tools.import_torch_checkpoint as imp_tool
    from cyclegan_tpu.train.supervised import SupervisedTrainer

    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=NGF,
                 ndf=NDF, bf16=False, crop_height=H, crop_width=W,
                 batch_size=2, num_devices=1)
    trainer = SupervisedTrainer(cfg, N_CLASSES, 3, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(1))
    ckpt_dir = str(tmp_path / "ckpt")
    mngr = CheckpointManager(ckpt_dir)
    mngr.save(2, jax.device_get(state))
    mngr.wait()
    mngr.close()

    out = str(tmp_path / "sup.ckpt")
    monkeypatch.setattr(sys, "argv", [
        "export_torch_checkpoint.py", ckpt_dir, out,
        "--model", "supervised", "--dataset", "synthetic",
        "--gen_net", "resnet_6blocks", "--ngf", str(NGF), "--ndf", str(NDF),
        "--size", str(H), "--num_classes", str(N_CLASSES)])
    exp_tool.main()
    assert torch.load(out, map_location="cpu",
                      weights_only=False)["epoch"] == 2

    back_dir = str(tmp_path / "back")
    monkeypatch.setattr(sys, "argv", [
        "import_torch_checkpoint.py", out, back_dir,
        "--model", "supervised", "--gen_net", "resnet_6blocks",
        "--ngf", str(NGF), "--ndf", str(NDF), "--size", str(H),
        "--num_classes", str(N_CLASSES), "--in_channels", "3"])
    imp_tool.main()
    mngr = CheckpointManager(back_dir)
    restored = mngr.restore(trainer.init_state(jax.random.PRNGKey(9)))
    mngr.close()
    assert restored is not None and restored[1] == 3  # (state, next_epoch)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored[0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_tool_end_to_end(tmp_path, monkeypatch):
    """Orbax checkpoint dir -> torch latest.ckpt via the tool's CLI main."""
    import tools.export_torch_checkpoint as tool

    cfg, trainer, state = _trainer_state()
    ckpt_dir = str(tmp_path / "ckpt")
    mngr = CheckpointManager(ckpt_dir)
    mngr.save(3, jax.device_get(state))
    mngr.wait()
    mngr.close()

    out = str(tmp_path / "latest.ckpt")
    monkeypatch.setattr(sys, "argv", [
        "export_torch_checkpoint.py", ckpt_dir, out,
        "--dataset", "synthetic", "--gen_net", "resnet_6blocks",
        "--ngf", str(NGF), "--ndf", str(NDF), "--size", str(H),
        "--num_classes", str(N_CLASSES)])
    tool.main()
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    back = import_net(ckpt["Gsi"], state.g_i2l)
    for a, b in zip(jax.tree.leaves(state.g_i2l), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_adam_moments_rejects_mismatched_widths():
    """A moment tensor that fits neither conv nor deconv layout raises
    (instead of silently writing wrong-shaped optimizer state that only
    breaks at torch's first opt.step())."""
    import itertools

    import pytest

    _, trainer, state = _trainer_state()
    torch.manual_seed(0)
    # Wrong --ngf/--ndf: same conv COUNT, different per-layer shapes.
    G_i2l, G_l2i, D_img, D_lab = build(N_CLASSES, 3, NGF * 2, NDF * 2, 6)
    g_opt_t = torch.optim.Adam(
        itertools.chain(G_i2l.parameters(), G_l2i.parameters()),
        lr=2e-4, betas=(0.5, 0.999))
    with pytest.raises(ValueError, match="fits neither"):
        export_adam_moments(
            state.g_opt, [state.g_i2l, state.g_l2i],
            [G_i2l.state_dict(), G_l2i.state_dict()], g_opt_t.state_dict())
