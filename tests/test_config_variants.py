"""Config-variant coverage: every factory option must train one step
(SURVEY.md §2 factory surfaces: netG resnet/unet, netD n_layers/pixel,
norm instance/batch/none)."""

import jax
import numpy as np
import pytest

from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.train.supervised import SupervisedTrainer
from cyclegan_tpu.utils.config import Config


def _batch(rng, b, h, w, c, k):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "lab_image": jax.random.uniform(k1, (b, h, w, c), minval=-1, maxval=1),
        "lab_label": jax.random.randint(k2, (b, h, w), 0, k),
        "unlab_image": jax.random.uniform(k3, (b, h, w, c), minval=-1, maxval=1),
    }


@pytest.mark.parametrize("dis_net", ["n_layers", "pixel"])
def test_cyclegan_step_with_each_discriminator(dis_net):
    cfg = Config(gen_net="resnet_6blocks", dis_net=dis_net, ngf=8, ndf=8,
                 bf16=True, crop_height=32, crop_width=32, batch_size=2,
                 pool_size=2, epochs=2, decay_epoch=1)
    tr = CycleGANTrainer(cfg, num_classes=5, in_channels=3, steps_per_epoch=4)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = jax.jit(tr.train_step, donate_argnums=0)(
        state, _batch(jax.random.PRNGKey(1), 2, 32, 32, 3, 5))
    assert np.isfinite(float(m["g_total"])) and np.isfinite(float(m["d_total"]))


@pytest.mark.parametrize("norm", ["batch", "none"])
def test_supervised_step_with_norm_variants(norm):
    cfg = Config(gen_net="resnet_6blocks", ngf=8, norm=norm, bf16=False,
                 crop_height=32, crop_width=32, batch_size=2,
                 epochs=2, decay_epoch=1)
    tr = SupervisedTrainer(cfg, num_classes=4, in_channels=3, steps_per_epoch=4)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)),
        "label": jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32), 0, 4),
    }
    state, m = jax.jit(tr.train_step, donate_argnums=0)(state, batch)
    assert np.isfinite(float(m["ce_loss"]))


def test_unet_generator_trainer_step():
    cfg = Config(gen_net="unet_128", ngf=8, ndf=8, bf16=True,
                 crop_height=128, crop_width=128, batch_size=1, pool_size=2,
                 epochs=2, decay_epoch=1)
    tr = CycleGANTrainer(cfg, num_classes=5, in_channels=3, steps_per_epoch=4)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = jax.jit(tr.train_step, donate_argnums=0)(
        state, _batch(jax.random.PRNGKey(1), 1, 128, 128, 3, 5))
    assert np.isfinite(float(m["g_total"]))


@pytest.mark.parametrize("name", ["voc_supervised_128", "voc_semisup_256",
                                  "cityscapes_semisup_512x256", "acdc_semisup",
                                  "voc_dp8_bf16"])
def test_every_baseline_preset_initializes(name):
    """All 5 BASELINE.json presets construct their trainer and init state
    at the preset's real shapes (init only — steps are covered at small
    shapes elsewhere; CI has no TPU)."""
    from cyclegan_tpu.data.datasets import DATASET_SPECS
    from cyclegan_tpu.utils.config import preset

    cfg = preset(name)
    classes, in_ch, _ = DATASET_SPECS[cfg.dataset]
    if name == "voc_supervised_128":
        tr = SupervisedTrainer(cfg, classes, in_ch, steps_per_epoch=10)
    else:
        tr = CycleGANTrainer(cfg, classes, in_ch, steps_per_epoch=10)
    state = tr.init_state(jax.random.PRNGKey(0))
    leaves = jax.tree.leaves(state)
    assert leaves and all(np.isfinite(np.asarray(x)).all() for x in leaves
                          if hasattr(x, "dtype") and x.dtype.kind == "f")
