"""SavedModel export head (cyclegan_tpu/export.py::export_savedmodel,
CLI ``--export_format savedmodel``): the TF-Serving-compatible container
around the same natively-serialized StableHLO as the .shlo artifact.

Proof obligations: tf.saved_model.load round-trips; the serving_default
signature reproduces the live jitted predictor bit-for-bit at two batch
sizes (polymorphic batch); the manifest lands inside the SavedModel dir;
the CLI drives checkpoint -> SavedModel end-to-end.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from cyclegan_tpu import export as export_lib  # noqa: E402
from cyclegan_tpu.main import main as cli_main  # noqa: E402
from cyclegan_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from cyclegan_tpu.train.cyclegan import CycleGANTrainer  # noqa: E402
from cyclegan_tpu.utils.config import Config  # noqa: E402

H = W = 24
NUM_CLASSES, IN_CH = 21, 3


def _cfg(tmp, **kw) -> Config:
    return Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4,
                  ndf=4, bf16=False, crop_height=H, crop_width=W,
                  batch_size=2, pool_size=2, num_devices=1,
                  checkpoint_dir=str(tmp / "ckpt"),
                  results_dir=str(tmp / "out"), **kw)


def _image(batch, seed=0):
    return np.asarray(jax.random.uniform(
        jax.random.PRNGKey(seed), (batch, H, W, IN_CH), jnp.float32,
        -1.0, 1.0))


def test_savedmodel_roundtrip_polymorphic(tmp_path):
    cfg = _cfg(tmp_path)
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    out_dir = str(tmp_path / "sm")
    spec = jax.ShapeDtypeStruct((1, H, W, IN_CH), jnp.float32)
    export_lib.export_savedmodel(
        trainer.predict, state.g_i2l, spec, out_dir, batch="b",
        platforms=("cpu",), manifest={"head": "segment"})

    loaded = tf.saved_model.load(out_dir)
    serve = loaded.signatures["serving_default"]
    ref = jax.jit(trainer.predict)
    for b in (1, 3):  # one SavedModel, any batch (polymorphic dim 0)
        x = _image(b, seed=b)
        (got,) = serve(input=tf.constant(x)).values()
        assert got.shape == (b, H, W)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(ref(state.g_i2l, x)))

    with open(os.path.join(out_dir, "cyclegan_tpu_manifest.json")) as f:
        man = json.load(f)
    assert man["format"] == "tf_saved_model"
    assert man["head"] == "segment"
    assert man["input_shape"] == [None, H, W, IN_CH]


def test_cli_export_savedmodel(tmp_path):
    """checkpoint -> --export_format savedmodel end-to-end through the CLI."""
    cfg = _cfg(tmp_path)
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mngr = CheckpointManager(cfg.checkpoint_dir)
    mngr.save(0, jax.device_get(state))
    mngr.wait()
    mngr.close()

    out_dir = str(tmp_path / "cli_sm")
    cli_main(["--export", out_dir, "--export_format", "savedmodel",
              "--export_platforms", "cpu", "--dataset", "synthetic",
              "--gen_net", "resnet_6blocks", "--ngf", "4", "--ndf", "4",
              "--no_bf16", "--crop_height", str(H), "--crop_width", str(W),
              "--pool_size", "2", "--platform", "cpu",
              "--checkpoint_dir", cfg.checkpoint_dir,
              "--results_dir", cfg.results_dir])
    assert os.path.exists(os.path.join(out_dir, "saved_model.pb"))
    loaded = tf.saved_model.load(out_dir)
    serve = loaded.signatures["serving_default"]
    (got,) = serve(input=tf.constant(_image(2))).values()
    ref = jax.jit(trainer.predict)(state.g_i2l, _image(2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
