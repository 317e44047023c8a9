"""Gradient accumulation (Config.grad_accum / trainer.accum_step): ONE
optimizer update from K stacked microbatches must equal one train_step on
the concatenated K*B batch — losses exactly (means of equal-size microbatch
means), params up to Adam's amplification of float-associativity noise
(the compile-variant noise class BASELINE.md documents). Pool and
batch-norm semantics are per-microbatch (documented divergences) and are
pinned here too."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.train.supervised import SupervisedTrainer
from cyclegan_tpu.utils.config import Config


def _cfg(**kw):
    base = dict(gen_net="resnet_6blocks", ngf=4, ndf=4, bf16=False,
                crop_height=32, crop_width=32, batch_size=2, pool_size=0,
                epochs=2, decay_epoch=1)
    base.update(kw)
    return Config(**base)


def _microbatches(n, b=2, hw=32, classes=5, valid_only=True):
    """Labels all-valid by default: the equivalence below relies on equal
    CE valid-pixel counts across microbatches (the documented convention)."""
    k = jax.random.PRNGKey(1)
    hi = classes if valid_only else classes + 1
    return [{
        "lab_image": jax.random.uniform(jax.random.fold_in(k, i),
                                        (b, hw, hw, 3), minval=-1, maxval=1),
        "lab_label": jax.random.randint(jax.random.fold_in(k, 100 + i),
                                        (b, hw, hw), 0, hi),
        "unlab_image": jax.random.uniform(jax.random.fold_in(k, 200 + i),
                                          (b, hw, hw, 3), minval=-1,
                                          maxval=1),
    } for i in range(n)]


def _stack(ms):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ms)


def _concat(ms):
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *ms)


def _flat(tree):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(tree)])


class TestCycleGANAccum:
    def test_matches_big_batch(self):
        """accum_step(K=2, b=2) == train_step(b=4) with pool_size=0,
        instance norm, no dropout: losses to 1e-5, params to one
        Adam-step's noise floor."""
        cfg = _cfg()
        tr = CycleGANTrainer(cfg, 5, 3, 4)
        state = tr.init_state(jax.random.PRNGKey(0))
        ms = _microbatches(2)
        s_acc, m_acc = jax.jit(tr.accum_step)(state, _stack(ms))
        s_big, m_big = jax.jit(tr.train_step)(state, _concat(ms))
        assert set(m_acc) == set(m_big)
        for key in m_big:
            np.testing.assert_allclose(float(m_acc[key]), float(m_big[key]),
                                       rtol=1e-4, err_msg=key)
        # Mean-of-microbatch grads equal big-batch grads up to float
        # associativity; Adam's rescale amplifies that into at most a
        # few lr-sized (2e-4) coordinate flips — bound by 3*lr.
        for name in ("g_i2l", "g_l2i", "d_img", "d_lab"):
            a, b = (_flat(getattr(s_acc, name)),
                    _flat(getattr(s_big, name)))
            assert np.max(np.abs(a - b)) < 3 * cfg.lr, name
        assert int(s_acc.step) == int(s_big.step) == 1

    def test_pool_advances_per_microbatch(self):
        """With replay on, the pools see K sequential queries: after one
        accum_step the pools hold K*B items (same count as the big-batch
        step — the reference walks items sequentially either way)."""
        cfg = _cfg(pool_size=8)
        tr = CycleGANTrainer(cfg, 5, 3, 4)
        state = tr.init_state(jax.random.PRNGKey(0))
        s_acc, m = jax.jit(tr.accum_step)(state, _stack(_microbatches(3)))
        assert int(s_acc.pool_img.count) == 6
        assert int(s_acc.pool_lab.count) == 6
        assert all(np.isfinite(float(v)) for v in m.values())

    def test_batchnorm_stats_chain(self):
        """norm=batch: accum_step runs and chains running stats across
        microbatches — stats move from init and the step stays finite."""
        cfg = _cfg(norm="batch")
        tr = CycleGANTrainer(cfg, 5, 3, 4)
        state = tr.init_state(jax.random.PRNGKey(0))
        s, m = jax.jit(tr.accum_step)(state, _stack(_microbatches(2)))
        assert all(np.isfinite(float(v)) for v in m.values())
        before = _flat(state.g_i2l["batch_stats"])
        after = _flat(s.g_i2l["batch_stats"])
        assert np.max(np.abs(after - before)) > 0
        # D stats advance too (G-phase forwards + D phase)
        assert np.max(np.abs(_flat(s.d_img["batch_stats"])
                             - _flat(state.d_img["batch_stats"]))) > 0


class TestSupervisedAccum:
    def test_matches_big_batch(self):
        cfg = _cfg()
        tr = SupervisedTrainer(cfg, 5, 3, 4)
        state = tr.init_state(jax.random.PRNGKey(0))
        ms = _microbatches(2)
        mb = [{"image": m["lab_image"], "label": m["lab_label"]} for m in ms]
        s_acc, m_acc = jax.jit(tr.accum_step)(state, _stack(mb))
        s_big, m_big = jax.jit(tr.train_step)(state, _concat(mb))
        np.testing.assert_allclose(float(m_acc["ce_loss"]),
                                   float(m_big["ce_loss"]), rtol=1e-5)
        assert np.max(np.abs(_flat(s_acc.params) - _flat(s_big.params))) \
            < 3 * cfg.lr

    def test_batchnorm_stats_equal_sequential_forwards(self):
        """norm=batch running stats after accum_step(K=2) equal two chained
        train-mode forwards (torch semantics of K separate forwards) —
        train-mode outputs don't read the running stats, so the chain is
        computable independently of the optimizer update."""
        cfg = _cfg(norm="batch")
        tr = SupervisedTrainer(cfg, 5, 3, 4)
        state = tr.init_state(jax.random.PRNGKey(0))
        ms = _microbatches(2)
        mb = [{"image": m["lab_image"], "label": m["lab_label"]} for m in ms]
        s_acc, _ = jax.jit(tr.accum_step)(state, _stack(mb))
        p = state.params
        for m in mb:
            _, upd = tr.model.apply(p, m["image"], deterministic=False,
                                    mutable=["batch_stats"])
            p = {**p, **upd}
        np.testing.assert_allclose(
            _flat(s_acc.params["batch_stats"]),
            _flat(p["batch_stats"]), rtol=1e-6, atol=1e-7)


def test_select_step_dispatch():
    from cyclegan_tpu.parallel import select_step

    tr = CycleGANTrainer(_cfg(), 5, 3, 4)
    assert select_step(tr, 1, 1) == tr.train_step
    assert select_step(tr, 2, 1) == tr.multi_step
    assert select_step(tr, 1, 2) == tr.accum_step
    with pytest.raises(ValueError):
        select_step(tr, 2, 2)


def test_runner_grad_accum(tmp_path):
    """Full runner with grad_accum=2: stacked sharding, accum step, step
    accounting (max_steps counts OPTIMIZER steps), checkpoint."""
    from cyclegan_tpu.train.runner import run_cyclegan

    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4,
                 ndf=4, bf16=False, crop_height=32, crop_width=32,
                 batch_size=2, pool_size=0, labeled_fraction=0.5,
                 epochs=1, decay_epoch=1, dataset_size=8,
                 validation_every=1, log_every=2, grad_accum=2,
                 num_devices=1,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "res"))
    result = run_cyclegan(cfg, max_steps=2)
    assert "miou" in result
    assert list((tmp_path / "ckpt").iterdir())


def test_accum_dp8_matches_single_device():
    """accum_step sharded over an 8-device data mesh produces the same
    losses as unsharded execution (XLA psums each microbatch's grads over
    the mesh inside the scan; the accumulated mean is replicated)."""
    from cyclegan_tpu.parallel import (
        jit_step, make_mesh, replicate_state, select_step, shard_batch)

    cfg = _cfg(batch_size=8)
    tr = CycleGANTrainer(cfg, 5, 3, 4)
    state = tr.init_state(jax.random.PRNGKey(0))
    ms = _microbatches(2, b=8)
    stackb = _stack(ms)

    s1, m1 = jax.jit(tr.accum_step)(state, stackb)

    mesh = make_mesh(8)
    state8 = replicate_state(state, mesh)
    batch8 = shard_batch(jax.tree.map(np.asarray, stackb), mesh,
                         leading_stack=True)
    step = jit_step(select_step(tr, 1, 2), donate_state=False)
    s8, m8 = step(state8, batch8)
    for key in m1:
        np.testing.assert_allclose(float(m8[key]), float(m1[key]),
                                   rtol=5e-5, err_msg=key)
    np.testing.assert_allclose(_flat(s8.g_i2l), _flat(s1.g_i2l),
                               atol=3 * cfg.lr)


def test_runner_rejects_both_stacks(tmp_path):
    from cyclegan_tpu.train.runner import run_cyclegan

    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4,
                 ndf=4, bf16=False, crop_height=32, crop_width=32,
                 batch_size=2, pool_size=0, labeled_fraction=0.5,
                 epochs=1, decay_epoch=1, dataset_size=8,
                 steps_per_call=2, grad_accum=2, num_devices=1,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "res"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_cyclegan(cfg, max_steps=2)
