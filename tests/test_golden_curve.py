"""Golden loss-curve regression test (SURVEY.md §4 'loss-curve golden file'):
a fixed-seed supervised run must reproduce the committed trajectory. Guards
init, data pipeline RNG, loss, optimizer and schedule against silent drift."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.data.datasets import make_dataset
from cyclegan_tpu.data.loader import Loader
from cyclegan_tpu.train.supervised import SupervisedTrainer
from cyclegan_tpu.utils.config import Config

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "supervised_losses.json").read_text())


def test_supervised_curve_matches_golden():
    cfg = Config(gen_net="resnet_6blocks", ngf=8, bf16=False,
                 crop_height=32, crop_width=32, batch_size=2,
                 epochs=100, decay_epoch=50)
    ds = make_dataset("synthetic", size=8)
    loader = Loader(ds, batch_size=2, crop_hw=(32, 32), train=True, seed=0)
    tr = SupervisedTrainer(cfg, 21, 3, loader.steps_per_epoch())
    state = tr.init_state(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_step, donate_argnums=0)
    losses = []
    for e in range(3):
        for b in loader.epoch(e):
            state, m = step(state, {"image": jnp.asarray(b["image"]),
                                    "label": jnp.asarray(b["label"])})
            losses.append(float(m["ce_loss"]))
    np.testing.assert_allclose(losses, GOLDEN["losses"], rtol=2e-4)
