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
