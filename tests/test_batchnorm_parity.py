"""BatchNorm2d semantics for the `--norm batch` option (round-1 VERDICT
coverage partial): torch train/eval parity including running statistics.

torch oracle: BatchNorm2d(affine=True, eps=1e-5, momentum=0.1). Known
divergence (documented in ops/blocks.py): flax feeds the BIASED batch
variance into the running-var EMA where torch uses the unbiased one — the
running-var check below corrects by (n-1)/n to assert everything else
matches exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cyclegan_tpu.ops.blocks import ConvBlock


def _make(c_in=5, c_out=7, hw=10, batch=4, steps=3, seed=0):
    rng = np.random.default_rng(seed)
    xs = [rng.normal(size=(batch, hw, hw, c_in)).astype(np.float32)
          for _ in range(steps)]
    w = rng.normal(size=(3, 3, c_in, c_out)).astype(np.float32) * 0.1
    b = rng.normal(size=(c_out,)).astype(np.float32)
    return xs, w, b


def _torch_forward(xs, w, b, train_steps):
    conv = torch.nn.Conv2d(w.shape[2], w.shape[3], 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.tensor(b))
    bn = torch.nn.BatchNorm2d(w.shape[3], eps=1e-5, momentum=0.1)
    outs = []
    bn.train()
    for x in xs[:train_steps]:
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        y = torch.relu(bn(conv(t)))
        outs.append(y.detach().numpy().transpose(0, 2, 3, 1))
    bn.eval()
    t = torch.tensor(xs[-1].transpose(0, 3, 1, 2))
    eval_out = torch.relu(bn(conv(t))).detach().numpy().transpose(0, 2, 3, 1)
    stats = (bn.running_mean.numpy(), bn.running_var.numpy())
    return outs, eval_out, stats


def test_batchnorm_train_eval_and_running_stats_match_torch():
    xs, w, b = _make()
    blk = ConvBlock(features=w.shape[3], kernel=3, pad=1, pad_mode="zero",
                    norm="batch", act="relu")
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
    assert "batch_stats" in variables
    # inject the torch conv weights (BN affine starts at scale 1 / bias 0 in
    # both frameworks)
    params = jax.tree.map(lambda x: x, variables)
    params["params"]["kernel"] = jnp.asarray(w)
    params["params"]["bias"] = jnp.asarray(b)

    t_outs, t_eval, (t_mean, t_var) = _torch_forward(xs, w, b, train_steps=2)

    # two train-mode applies with stats chaining
    for i in range(2):
        y, upd = blk.apply(params, jnp.asarray(xs[i]), deterministic=False,
                           mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), t_outs[i],
                                   rtol=1e-4, atol=1e-5)
        params = {**params, **upd}

    # running stats (correct torch's unbiased-EMA input by (n-1)/n)
    n = xs[0].shape[0] * xs[0].shape[1] * xs[0].shape[2]
    bn_stats = params["batch_stats"]
    leaves = {"/".join(str(getattr(k, "key", k)) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(bn_stats)[0]}
    mean = next(v for k, v in leaves.items() if k.endswith("mean"))
    var = next(v for k, v in leaves.items() if k.endswith("var"))
    np.testing.assert_allclose(np.asarray(mean), t_mean, rtol=1e-4, atol=1e-5)
    # torch running_var EMA uses unbiased batch var: reconstruct the biased
    # equivalent torch WOULD have produced for comparison with flax.
    # after 2 steps from var0=1: torch v = .81 + .09*u1 + .1*u2 with
    # u_i = biased_i * n/(n-1); flax v = .81 + .09*b1 + .1*b2.
    scale = n / (n - 1)
    flax_as_unbiased = (np.asarray(var) - 0.81) * scale + 0.81
    np.testing.assert_allclose(flax_as_unbiased, t_var, rtol=1e-3, atol=1e-4)

    # eval mode uses running averages
    y_eval = blk.apply(params, jnp.asarray(xs[-1]))  # deterministic default
    # the biased-vs-unbiased EMA divergence bounds the eval delta
    np.testing.assert_allclose(np.asarray(y_eval), t_eval, rtol=2e-2, atol=2e-2)


def _bn_paths_resnet_gen(n_blocks):
    """Flax batch_stats paths of ResnetGenerator in FORWARD order (= torch's
    module registration order for ResnetG)."""
    paths = [("ConvBlock_0",), ("ConvBlock_1",), ("ConvBlock_2",)]
    for b in range(n_blocks):
        paths += [(f"ResidualBlock_{b}", "ConvBlock_0"),
                  (f"ResidualBlock_{b}", "ConvBlock_1")]
    paths += [("DeconvBlock_0",), ("DeconvBlock_1",)]
    return paths


def _bn_paths_patchgan(n_layers=3):
    return [(f"ConvBlock_{k}",) for k in range(1, n_layers + 1)]


def _flax_bn_stats(variables, paths):
    out = []
    for p in paths:
        node = variables["batch_stats"]
        for k in p:
            node = node[k]
        bn = node["BatchNorm_0"]
        out.append((np.asarray(bn["mean"]), np.asarray(bn["var"])))
    return out


def _torch_bn_stats(tmodel):
    return [(m.running_mean.numpy().copy(), m.running_var.numpy().copy())
            for m in tmodel.modules()
            if isinstance(m, torch.nn.BatchNorm2d)]


def test_full_step_d_running_stats_match_torch():
    """VERDICT r2 item 5: with --norm batch, a FULL G+D train step must leave
    the same D running-stat trajectory as torch — including the D forwards
    that happen inside the G phase (adversarial terms), which torch's
    BatchNorm records and round-2 discarded. Also locks the G forward ORDER
    (unlab -> label-cycle -> supervised): BN's EMA is order-sensitive.

    running_mean compares tightly; running_var corrects the documented
    flax-biased/torch-unbiased EMA-input divergence exactly per layer
    (n = B*H_l*W_l elements per channel; K train-mode forwards of that net):
        torch_var = 0.9^K + (flax_var - 0.9^K) * n/(n-1)
    """
    import itertools
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from parity_utils import inject_patchgan, inject_resnet_gen

    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config
    from tools.torch_reference import PatchD, ResnetG, train_step as torch_step

    N_CLASSES, SIZE, NGF, NDF, NB, B = 5, 32, 8, 8, 2, 2
    bn2d = lambda c: torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    torch.manual_seed(0)
    tmodels = (ResnetG(3, N_CLASSES, NGF, NB, tanh=False, norm=bn2d),
               ResnetG(N_CLASSES, 3, NGF, NB, tanh=True, norm=bn2d),
               PatchD(3, NDF, norm=bn2d), PatchD(N_CLASSES, NDF, norm=bn2d))

    cfg = Config(gen_net="resnet_6blocks", ngf=NGF, ndf=NDF, norm="batch",
                 bf16=False, crop_height=SIZE, crop_width=SIZE, batch_size=B,
                 pool_size=0, epochs=200, decay_epoch=100)
    tr = CycleGANTrainer(cfg, N_CLASSES, 3, steps_per_epoch=1000)
    tr.G_i2l = tr.G_i2l.clone(n_blocks=NB)
    tr.G_l2i = tr.G_l2i.clone(n_blocks=NB)
    state = tr.init_state(jax.random.PRNGKey(0))
    state = state._replace(
        g_i2l=inject_resnet_gen(state.g_i2l, tmodels[0], NB),
        g_l2i=inject_resnet_gen(state.g_l2i, tmodels[1], NB),
        d_img=inject_patchgan(state.d_img, tmodels[2]),
        d_lab=inject_patchgan(state.d_lab, tmodels[3]))
    state = state._replace(g_opt=tr.g_tx.init((state.g_i2l, state.g_l2i)),
                           d_opt=tr.d_tx.init((state.d_img, state.d_lab)))

    g = torch.Generator().manual_seed(42)
    lab_img_t = torch.randn(B, 3, SIZE, SIZE, generator=g)
    unlab_img_t = torch.randn(B, 3, SIZE, SIZE, generator=g)
    lab_lab_t = torch.randint(0, N_CLASSES, (B, SIZE, SIZE), generator=g)
    lab_oh_t = torch.nn.functional.one_hot(lab_lab_t, N_CLASSES) \
        .permute(0, 3, 1, 2).float()
    t_opts = (torch.optim.Adam(itertools.chain(tmodels[0].parameters(),
                                               tmodels[1].parameters()),
                               2e-4, betas=(0.5, 0.999)),
              torch.optim.Adam(itertools.chain(tmodels[2].parameters(),
                                               tmodels[3].parameters()),
                               2e-4, betas=(0.5, 0.999)))
    batch = {
        "lab_image": jnp.asarray(lab_img_t.numpy().transpose(0, 2, 3, 1)),
        "lab_label": jnp.asarray(lab_lab_t.numpy()).astype(jnp.int32),
        "unlab_image": jnp.asarray(unlab_img_t.numpy().transpose(0, 2, 3, 1)),
    }
    state, _ = jax.jit(tr.train_step, donate_argnums=0)(state, batch)
    for m in tmodels:
        m.train()
    torch_step(tmodels, t_opts, (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t))

    # BN spatial dims per layer (for the exact var correction): gen layers at
    # SIZE, SIZE/2, SIZE/4 (stem/downs), trunk at SIZE/4, deconvs back up;
    # patchgan at SIZE/2/2, /4, then stride-1 (H/4 - 1).
    gen_hw = [SIZE, SIZE // 2, SIZE // 4] + [SIZE // 4] * (2 * NB) \
        + [SIZE // 2, SIZE]
    dis_hw = [SIZE // 4, SIZE // 8, SIZE // 8 - 1]
    checks = [
        ("g_i2l", state.g_i2l, tmodels[0], _bn_paths_resnet_gen(NB), 3, gen_hw),
        ("g_l2i", state.g_l2i, tmodels[1], _bn_paths_resnet_gen(NB), 2, gen_hw),
        ("d_img", state.d_img, tmodels[2], _bn_paths_patchgan(), 3, dis_hw),
        ("d_lab", state.d_lab, tmodels[3], _bn_paths_patchgan(), 3, dis_hw),
    ]
    for name, variables, tmodel, paths, K, hws in checks:
        flax_stats = _flax_bn_stats(variables, paths)
        torch_stats = _torch_bn_stats(tmodel)
        assert len(flax_stats) == len(torch_stats) == len(hws), name
        for (fm, fv), (tm, tv), hw in zip(flax_stats, torch_stats, hws):
            np.testing.assert_allclose(
                fm, tm, rtol=1e-3, atol=1e-5,
                err_msg=f"{name}: running_mean trajectory diverged")
            n = B * hw * hw
            corrected = 0.9 ** K + (fv - 0.9 ** K) * n / (n - 1)
            np.testing.assert_allclose(
                corrected, tv, rtol=1e-3, atol=1e-4,
                err_msg=f"{name}: running_var trajectory diverged (n={n})")


def test_cyclegan_batchnorm_stats_update_through_train_step():
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, norm="batch",
                 bf16=False, crop_height=32, crop_width=32, batch_size=2,
                 pool_size=0, epochs=2, decay_epoch=1)
    tr = CycleGANTrainer(cfg, num_classes=5, in_channels=3, steps_per_epoch=4)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "batch_stats" in state.g_i2l and "batch_stats" in state.d_img
    before = jax.tree.leaves(state.g_i2l["batch_stats"])[0].copy()
    d_before = jax.tree.leaves(state.d_img["batch_stats"])[0].copy()
    k = jax.random.PRNGKey(1)
    batch = {
        "lab_image": jax.random.uniform(k, (2, 32, 32, 3), minval=-1, maxval=1),
        "lab_label": jax.random.randint(k, (2, 32, 32), 0, 5),
        "unlab_image": jax.random.uniform(k, (2, 32, 32, 3), minval=-1, maxval=1),
    }
    state, m = jax.jit(tr.train_step, donate_argnums=0)(state, batch)
    assert np.isfinite(float(m["g_total"])) and np.isfinite(float(m["d_total"]))
    after = jax.tree.leaves(state.g_i2l["batch_stats"])[0]
    d_after = jax.tree.leaves(state.d_img["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), \
        "G running stats did not update through the train step"
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after)), \
        "D running stats did not update through the train step"


def test_supervised_batchnorm_stats_update():
    from cyclegan_tpu.train.supervised import SupervisedTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(gen_net="resnet_6blocks", ngf=8, norm="batch", bf16=False,
                 crop_height=32, crop_width=32, batch_size=2,
                 epochs=2, decay_epoch=1)
    tr = SupervisedTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=4)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "batch_stats" in state.params
    before = jax.tree.leaves(state.params["batch_stats"])[0].copy()
    k = jax.random.PRNGKey(1)
    batch = {"image": jax.random.uniform(k, (2, 32, 32, 3), minval=-1, maxval=1),
             "label": jax.random.randint(k, (2, 32, 32), 0, 4)}
    state, m = jax.jit(tr.train_step, donate_argnums=0)(state, batch)
    assert np.isfinite(float(m["ce_loss"]))
    after = jax.tree.leaves(state.params["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
