"""Multi-step scan batching (Config.steps_per_call / trainer.multi_step):
K train steps compiled into one device program. Loss trajectory must match
running K sequential steps; params match up to compile-variant rounding
(Adam amplifies near-zero adversarial-grad rounding into sign flips — the
same noise class BASELINE.md documents for any recompiled variant)."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config


def _setup():
    cfg = Config(gen_net="resnet_6blocks", ngf=4, ndf=4, bf16=False,
                 crop_height=32, crop_width=32, batch_size=2, pool_size=2,
                 epochs=2, decay_epoch=1)
    tr = CycleGANTrainer(cfg, 5, 3, 4)
    state = tr.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    batches = [{
        "lab_image": jax.random.uniform(jax.random.fold_in(k, i),
                                        (2, 32, 32, 3), minval=-1, maxval=1),
        "lab_label": jax.random.randint(jax.random.fold_in(k, 100 + i),
                                        (2, 32, 32), 0, 5),
        "unlab_image": jax.random.uniform(jax.random.fold_in(k, 200 + i),
                                          (2, 32, 32, 3), minval=-1, maxval=1),
    } for i in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    return tr, state, batches, stacked


def test_multi_step_matches_sequential():
    tr, state, batches, stacked = _setup()
    step = jax.jit(tr.train_step)
    s_seq, seq_ms = state, []
    for b in batches:
        s_seq, m = step(s_seq, b)
        seq_ms.append(m)

    def scan_all(s, bs):  # keep the full metric trajectory for the test
        return jax.lax.scan(tr.train_step, s, bs)

    s_scan, ms = jax.jit(scan_all)(state, stacked)
    # loss trajectory: every step, every metric
    for i, m in enumerate(seq_ms):
        for key in m:
            np.testing.assert_allclose(
                float(ms[key][i]), float(m[key]), rtol=1e-4,
                err_msg=f"step {i} metric {key}")
    # functional state chains (RNG, pools, step counter) are bit-identical
    np.testing.assert_array_equal(np.asarray(s_seq.rng),
                                  np.asarray(s_scan.rng))
    assert int(s_seq.step) == int(s_scan.step) == 3
    assert int(s_seq.pool_img.count) == int(s_scan.pool_img.count)
    # params agree to compile-variant noise
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(s_seq.g_i2l)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(s_scan.g_i2l)])
    assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 0.05


def test_runner_steps_per_call(tmp_path):
    """Full runner with steps_per_call=2: stacked sharding, scan step,
    step accounting, checkpoint."""
    from cyclegan_tpu.train.runner import run_cyclegan

    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4,
                 ndf=4, bf16=False, crop_height=32, crop_width=32,
                 batch_size=2, pool_size=0, labeled_fraction=0.5,
                 epochs=1, decay_epoch=1, dataset_size=8,
                 validation_every=1, log_every=2, steps_per_call=2,
                 num_devices=1,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "res"))
    result = run_cyclegan(cfg, max_steps=4)
    assert "miou" in result
    assert list((tmp_path / "ckpt").iterdir())


def test_multi_step_returns_last_metrics():
    tr, state, batches, stacked = _setup()
    s_scan, m_last = jax.jit(tr.multi_step)(state, stacked)
    step = jax.jit(tr.train_step)
    s_seq = state
    for b in batches:
        s_seq, m = step(s_seq, b)
    np.testing.assert_allclose(float(m_last["g_total"]),
                               float(m["g_total"]), rtol=1e-4)
    assert int(s_scan.step) == 3
