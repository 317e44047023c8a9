"""Integration tests: DP over 8 virtual devices, rectangular and grayscale
configs, end-to-end loss decrease on the synthetic dataset (SURVEY.md §4
"Integration" + "multi-device without a cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.parallel import (
    batch_sharding, jit_step, make_mesh, replicate_state, shard_batch)
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.train.supervised import SupervisedTrainer
from cyclegan_tpu.utils.config import Config


def _cyclegan_batch(rng, b, h, w, c, k):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "lab_image": jax.random.uniform(k1, (b, h, w, c), minval=-1, maxval=1),
        "lab_label": jax.random.randint(k2, (b, h, w), 0, k),
        "unlab_image": jax.random.uniform(k3, (b, h, w, c), minval=-1, maxval=1),
    }


class TestDataParallel8:
    def test_cyclegan_step_on_8_devices(self):
        assert jax.device_count() >= 8
        cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=True,
                     crop_height=32, crop_width=32, batch_size=8, pool_size=4,
                     epochs=2, decay_epoch=1)
        tr = CycleGANTrainer(cfg, num_classes=5, in_channels=3, steps_per_epoch=4)
        mesh = make_mesh(8)
        state = replicate_state(tr.init_state(jax.random.PRNGKey(0)), mesh)
        step = jit_step(tr.train_step)
        batch = shard_batch(_cyclegan_batch(jax.random.PRNGKey(1), 8, 32, 32, 3, 5), mesh)
        state, m = step(state, batch)
        state, m = step(state, batch)
        assert all(np.isfinite(float(v)) for v in jax.device_get(m).values())
        # Params stay replicated (no per-device drift).
        leaf = jax.tree.leaves(state.g_i2l)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_grads_match_single_device(self):
        """Global-batch gradient on 8 devices == same batch on 1 device.

        Compares gradients, not post-Adam params: Adam normalizes by sqrt(v),
        so near-zero grads make the update sign-sensitive to summation order.
        """
        from cyclegan_tpu.train import losses

        cfg = Config(gen_net="resnet_6blocks", ngf=8, bf16=False,
                     crop_height=16, crop_width=16, batch_size=8,
                     epochs=2, decay_epoch=1)
        tr = SupervisedTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=4)
        params = tr.init_state(jax.random.PRNGKey(0)).params
        batch = {
            "image": jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3)),
            "label": jax.random.randint(jax.random.PRNGKey(2), (8, 16, 16), 0, 4),
        }

        def loss_fn(p, b):
            return losses.cross_entropy_loss(
                tr.model.apply(p, b["image"]), b["label"])

        grad_fn = jax.jit(jax.grad(loss_fn))
        mesh8, mesh1 = make_mesh(8), make_mesh(1)
        g8 = jax.device_get(grad_fn(replicate_state(params, mesh8),
                                    shard_batch(batch, mesh8)))
        g1 = jax.device_get(grad_fn(replicate_state(params, mesh1),
                                    shard_batch(batch, mesh1)))
        for a, b in zip(jax.tree.leaves(g8), jax.tree.leaves(g1)):
            np.testing.assert_allclose(a, b, atol=2e-6)


class TestSpatialSharding:
    def test_spatial_partition_matches_unsharded(self, monkeypatch):
        """(4,2) data x spatial mesh computes the same loss/grads as a single
        device — XLA's halo exchanges + IN stat reductions are transparent."""
        monkeypatch.setenv("CYCLEGAN_TPU_PALLAS", "off")
        from cyclegan_tpu.train import losses

        cfg = Config(gen_net="resnet_6blocks", ngf=8, bf16=False,
                     crop_height=32, crop_width=32, batch_size=4,
                     epochs=2, decay_epoch=1)
        tr = SupervisedTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=4)
        params = tr.init_state(jax.random.PRNGKey(0)).params
        batch = {
            "image": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3)),
            "label": jax.random.randint(jax.random.PRNGKey(2), (4, 32, 32), 0, 4),
        }

        def loss_fn(p, b):
            return losses.cross_entropy_loss(
                tr.model.apply(p, b["image"]), b["label"])

        vg = jax.jit(jax.value_and_grad(loss_fn))
        mesh_sp = make_mesh(8, spatial=2)
        mesh_1 = make_mesh(1)
        l_sp, g_sp = vg(replicate_state(params, mesh_sp),
                        shard_batch(batch, mesh_sp))
        l_1, g_1 = vg(replicate_state(params, mesh_1),
                      shard_batch(batch, mesh_1))
        assert abs(float(l_sp) - float(l_1)) < 1e-5
        for a, b in zip(jax.tree.leaves(jax.device_get(g_sp)),
                        jax.tree.leaves(jax.device_get(g_1))):
            np.testing.assert_allclose(a, b, atol=2e-6)


class TestShapeConfigs:
    def test_rectangular_cityscapes_shape(self):
        """512x256-style rectangular crops (H != W) through the full step."""
        cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=True,
                     crop_height=32, crop_width=64, batch_size=2, pool_size=2,
                     epochs=2, decay_epoch=1)
        tr = CycleGANTrainer(cfg, num_classes=19, in_channels=3, steps_per_epoch=4)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = _cyclegan_batch(jax.random.PRNGKey(1), 2, 32, 64, 3, 19)
        state, m = jax.jit(tr.train_step, donate_argnums=0)(state, batch)
        assert np.isfinite(float(m["g_total"]))

    def test_grayscale_acdc_shape(self):
        """1-channel in/out + 4-class head (ACDC config 4)."""
        cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=True,
                     crop_height=32, crop_width=32, batch_size=2, pool_size=2,
                     epochs=2, decay_epoch=1)
        tr = CycleGANTrainer(cfg, num_classes=4, in_channels=1, steps_per_epoch=4)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = _cyclegan_batch(jax.random.PRNGKey(1), 2, 32, 32, 1, 4)
        state, m = jax.jit(tr.train_step, donate_argnums=0)(state, batch)
        assert np.isfinite(float(m["g_total"]))
        # fake images must be 1-channel
        img = tr.generate_image(state.g_l2i, batch["lab_label"])
        assert img.shape[-1] == 1


class TestLearning:
    def test_supervised_loss_decreases(self):
        """The minimum end-to-end slice actually learns on synthetic data."""
        from cyclegan_tpu.data.datasets import make_dataset
        from cyclegan_tpu.data.loader import Loader

        cfg = Config(gen_net="resnet_6blocks", ngf=8, bf16=False,
                     crop_height=48, crop_width=48, batch_size=4,
                     epochs=20, decay_epoch=10)
        ds = make_dataset("synthetic", size=16)
        loader = Loader(ds, batch_size=4, crop_hw=(48, 48), train=True, seed=0)
        tr = SupervisedTrainer(cfg, num_classes=21, in_channels=3,
                               steps_per_epoch=loader.steps_per_epoch())
        state = tr.init_state(jax.random.PRNGKey(0))
        step = jax.jit(tr.train_step, donate_argnums=0)
        losses = []
        for e in range(8):
            for batch in loader.epoch(e):
                state, m = step(state, {"image": jnp.asarray(batch["image"]),
                                        "label": jnp.asarray(batch["label"])})
                losses.append(float(m["ce_loss"]))
        assert np.mean(losses[-4:]) < 0.8 * np.mean(losses[:4]), losses