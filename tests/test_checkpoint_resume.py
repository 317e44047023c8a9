"""Checkpoint/resume correctness (SURVEY.md §3e): training resumed from a
checkpoint must produce exactly the same state as uninterrupted training —
all params, optimizer moments, pools, and the PRNG key survive the roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.train.checkpoint import CheckpointManager
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config


def _batch(rng, b=2, h=24, w=24, c=3, k=4):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "lab_image": jax.random.uniform(k1, (b, h, w, c), minval=-1, maxval=1),
        "lab_label": jax.random.randint(k2, (b, h, w), 0, k),
        "unlab_image": jax.random.uniform(k3, (b, h, w, c), minval=-1, maxval=1),
    }


def test_resume_is_bit_exact(tmp_path):
    cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=False,
                 crop_height=24, crop_width=24, batch_size=2, pool_size=3,
                 epochs=4, decay_epoch=2)
    tr = CycleGANTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=2)
    step = jax.jit(tr.train_step)  # no donation: we reuse mid states
    batches = [_batch(jax.random.PRNGKey(i)) for i in range(5)]

    # Continuous run: 3 steps, snapshot, 2 more.
    state = tr.init_state(jax.random.PRNGKey(0))
    for b in batches[:3]:
        state, _ = step(state, b)
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(0, jax.device_get(state))
    mngr.wait()
    cont = state
    for b in batches[3:]:
        cont, _ = step(cont, b)

    # Resumed run: restore the snapshot, replay the same last 2 batches.
    template = tr.init_state(jax.random.PRNGKey(0))
    restored, next_epoch = mngr.restore(jax.device_get(template))
    assert next_epoch == 1
    mngr.close()
    for b in batches[3:]:
        restored, _ = step(restored, b)

    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(cont))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(restored)))
    for path, a in flat_a:
        b = flat_b[path]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_restore_none_when_empty(tmp_path):
    cfg = Config(gen_net="resnet_6blocks", ngf=8, bf16=False,
                 crop_height=24, crop_width=24, epochs=2, decay_epoch=1)
    tr = CycleGANTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=2)
    mngr = CheckpointManager(str(tmp_path / "empty"))
    assert mngr.restore(tr.init_state(jax.random.PRNGKey(0))) is None
    mngr.close()


def test_empty_pool_checkpoint_roundtrip(tmp_path):
    """pool_size=0 states (zero-size pool buffers) must save/restore: Orbax
    rejects zero-size arrays, so they're masked with a marker on save and
    substituted back from the template (round-3 fix — found by the VOC CLI
    fixture drive)."""
    cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=False,
                 crop_height=24, crop_width=24, batch_size=2, pool_size=0,
                 epochs=2, decay_epoch=1)
    tr = CycleGANTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=2)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert state.pool_img.buffer.size == 0
    mngr = CheckpointManager(str(tmp_path / "ck0"))
    mngr.save(0, jax.device_get(state))
    mngr.wait()
    restored, next_epoch = mngr.restore(
        jax.device_get(tr.init_state(jax.random.PRNGKey(1))))
    mngr.close()
    assert next_epoch == 1
    assert restored.pool_img.buffer.shape == state.pool_img.buffer.shape
    np.testing.assert_array_equal(
        np.asarray(restored.g_i2l["params"]["ConvBlock_0"]["kernel"]),
        np.asarray(state.g_i2l["params"]["ConvBlock_0"]["kernel"]))


def test_keep_best_tracks_max_miou_across_restarts(tmp_path, monkeypatch):
    """--keep_best: the best-val-mIoU epoch is kept under <ckpt>/best and a
    resumed run cannot overwrite it with a worse epoch (the score persists
    in best_metric.json)."""
    import json
    import os

    from cyclegan_tpu.train import runner

    scripted = iter([0.3, 0.5, 0.4])
    monkeypatch.setattr(runner, "_evaluate",
                        lambda *a, **k: {"miou": next(scripted)})
    cfg = Config(dataset="synthetic", dataset_size=8, labeled_fraction=0.5,
                 gen_net="resnet_6blocks", ngf=4, ndf=4, bf16=False,
                 crop_height=24, crop_width=24, batch_size=2, pool_size=2,
                 num_devices=1, epochs=3, decay_epoch=2, validation_every=1,
                 log_every=10, keep_best=True,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "out"))
    runner.run_cyclegan(cfg)
    metric_path = os.path.join(cfg.checkpoint_dir, "best_metric.json")
    with open(metric_path) as f:
        meta = json.load(f)
    assert meta == {"miou": 0.5, "epoch": 1}
    best = CheckpointManager(os.path.join(cfg.checkpoint_dir, "best"))
    assert best.latest_epoch() == 1
    best.close()

    # Restart with one more (worse) epoch: best must survive.
    scripted = iter([0.2])
    runner.run_cyclegan(cfg.replace(epochs=4, decay_epoch=3))
    with open(metric_path) as f:
        assert json.load(f) == {"miou": 0.5, "epoch": 1}
    best = CheckpointManager(os.path.join(cfg.checkpoint_dir, "best"))
    assert best.latest_epoch() == 1
    best.close()


def test_mid_wrapper_dict_reconciles_pool_shapes(tmp_path):
    """The mid-epoch wrapper ({"state": st, "epoch": ...} —
    runner._train_loop) must get the same stored-shape pool reconcile as a
    bare state: a pool_size change between the preempted run and the resume
    restores the STORED buffers instead of an opaque Orbax shape error."""
    def wrap(st):
        return {"state": st, "epoch": np.asarray(0, np.int64),
                "pos": np.asarray(1, np.int64),
                "gstep": np.asarray(1, np.int64),
                "spc": np.asarray(1, np.int64)}

    cfg4 = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=False,
                  crop_height=24, crop_width=24, batch_size=2, pool_size=4,
                  epochs=2, decay_epoch=1)
    tr4 = CycleGANTrainer(cfg4, num_classes=4, in_channels=3, steps_per_epoch=2)
    stored = tr4.init_state(jax.random.PRNGKey(0))
    mngr = CheckpointManager(str(tmp_path / "mid"))
    mngr.save(1, wrap(jax.device_get(stored)))
    mngr.wait()

    cfg2 = cfg4.replace(pool_size=2)
    tr2 = CycleGANTrainer(cfg2, num_classes=4, in_channels=3, steps_per_epoch=2)
    template = wrap(jax.device_get(tr2.init_state(jax.random.PRNGKey(1))))
    restored, _ = mngr.restore(template)
    mngr.close()
    assert restored["state"].pool_img.buffer.shape == \
        stored.pool_img.buffer.shape
    assert int(restored["pos"]) == 1


def test_empty_pool_checkpoint_mismatch_raises(tmp_path):
    """Resuming a pool_size=0 checkpoint with pool_size>0 raises an
    actionable error instead of restoring garbage."""
    import pytest

    cfg0 = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=False,
                  crop_height=24, crop_width=24, batch_size=2, pool_size=0,
                  epochs=2, decay_epoch=1)
    tr0 = CycleGANTrainer(cfg0, num_classes=4, in_channels=3, steps_per_epoch=2)
    mngr = CheckpointManager(str(tmp_path / "ckm"))
    mngr.save(0, jax.device_get(tr0.init_state(jax.random.PRNGKey(0))))
    mngr.wait()
    cfg50 = cfg0.replace(pool_size=50)
    tr50 = CycleGANTrainer(cfg50, num_classes=4, in_channels=3,
                           steps_per_epoch=2)
    with pytest.raises(ValueError, match="pool_size 0"):
        mngr.restore(jax.device_get(tr50.init_state(jax.random.PRNGKey(0))))
    mngr.close()
