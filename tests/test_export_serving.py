"""Serving export (cyclegan_tpu/export.py): checkpoint -> self-contained
StableHLO artifact via jax.export.

Beyond the reference (deployment there ends at --testing PNG dumps,
SURVEY.md §3c). Proof obligations: the deserialized artifact reproduces the
in-framework jitted predictor bit-for-bit, the batch dimension is symbolic
(one artifact, any batch), the artifact is self-contained (weights embedded
— callable with no params), and the CLI --export mode drives the whole
restore->export->save path.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu import export as export_lib
from cyclegan_tpu.main import main as cli_main
from cyclegan_tpu.train.checkpoint import CheckpointManager
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

H = W = 24
NUM_CLASSES, IN_CH = 21, 3


def _cfg(tmp, **kw) -> Config:
    return Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4,
                  ndf=4, bf16=False, crop_height=H, crop_width=W,
                  batch_size=2, pool_size=2, num_devices=1,
                  checkpoint_dir=str(tmp / "ckpt"),
                  results_dir=str(tmp / "out"), **kw)


@pytest.fixture(scope="module")
def trainer_state(tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("export"))
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return cfg, trainer, state


def _image(batch, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (batch, H, W, IN_CH),
                              jnp.float32, -1.0, 1.0)


def test_roundtrip_batch_polymorphic(trainer_state):
    """serialize -> deserialize -> call matches the live jitted predictor
    bit-for-bit, at two DIFFERENT batch sizes from one artifact."""
    _, trainer, state = trainer_state
    exported = export_lib.export_predictor(
        trainer.predict, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    rt = jax.export.deserialize(exported.serialize())
    ref = jax.jit(trainer.predict)
    for b in (1, 3):
        x = _image(b, seed=b)
        got = rt.call(x)
        assert got.shape == (b, H, W)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(ref(state.g_i2l, x)))


def test_multi_platform_lowering(trainer_state):
    """cpu+tpu lowering from a TPU-less host: the artifact advertises both
    platforms and still executes on cpu."""
    _, trainer, state = trainer_state
    exported = export_lib.export_predictor(
        trainer.predict, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu", "tpu"))
    assert set(exported.platforms) == {"cpu", "tpu"}
    out = jax.export.deserialize(exported.serialize()).call(_image(2))
    assert out.shape == (2, H, W)


def test_save_load_artifact_and_manifest(tmp_path, trainer_state):
    _, trainer, state = trainer_state
    exported = export_lib.export_predictor(
        trainer.predict, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        batch=4, platforms=("cpu",))
    path = str(tmp_path / "model.shlo")
    export_lib.save_artifact(path, exported, manifest={"head": "segment"})
    rt = export_lib.load_artifact(path)
    np.testing.assert_array_equal(
        np.asarray(rt.call(_image(4))),
        np.asarray(jax.jit(trainer.predict)(state.g_i2l, _image(4))))
    manifest = json.loads((tmp_path / "model.shlo.json").read_text())
    assert manifest["head"] == "segment"
    assert manifest["platforms"] == ["cpu"]
    assert manifest["jax_version"] == jax.__version__
    assert "24,24" in manifest["in_avals"][0].replace(" ", "")


def test_logits_head_matches_segment_argmax(trainer_state):
    """--export_what logits: raw class scores for serving hosts that
    ensemble/calibrate/tile downstream; its argmax must equal the segment
    head bit-for-bit."""
    _, trainer, state = trainer_state
    exported = export_lib.export_predictor(
        trainer.logits, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    rt = jax.export.deserialize(exported.serialize())
    x = _image(3)
    logits = np.asarray(rt.call(x))
    assert logits.shape == (3, H, W, NUM_CLASSES)
    assert np.issubdtype(logits.dtype, np.floating)
    np.testing.assert_array_equal(
        np.argmax(logits, axis=-1),
        np.asarray(jax.jit(trainer.predict)(state.g_i2l, x)))


def test_cli_export_segment_and_generate(tmp_path):
    """The full CLI path: write a checkpoint, `--export` both heads, load
    and run each artifact."""
    cfg = _cfg(tmp_path)
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(1))
    ckpt = CheckpointManager(cfg.checkpoint_dir)
    ckpt.save(0, jax.device_get(state))
    ckpt.wait()
    ckpt.close()

    base = ["--dataset", "synthetic", "--gen_net", "resnet_6blocks",
            "--ngf", "4", "--ndf", "4", "--no_bf16", "--num_devices", "1",
            "--crop_height", str(H), "--crop_width", str(W),
            "--pool_size", "2", "--checkpoint_dir", cfg.checkpoint_dir,
            "--results_dir", cfg.results_dir, "--export_platforms", "cpu"]

    seg_path = str(tmp_path / "seg.shlo")
    cli_main(["--export", seg_path] + base)
    seg = export_lib.load_artifact(seg_path)
    pred = np.asarray(seg.call(_image(2)))
    assert pred.shape == (2, H, W) and pred.max() < NUM_CLASSES
    # Segment artifacts ship 1-byte class maps (export.uint8_output).
    assert pred.dtype == np.uint8
    manifest = json.loads((tmp_path / "seg.shlo.json").read_text())
    assert manifest["num_classes"] == NUM_CLASSES
    assert manifest["trained_steps"] == 0
    # Self-describing artifact: per-class labels travel with the weights.
    assert manifest["class_names"] == [f"class_{i}"
                                       for i in range(NUM_CLASSES)]

    log_path = str(tmp_path / "logits.shlo")
    cli_main(["--export", log_path, "--export_what", "logits"] + base)
    lg = np.asarray(export_lib.load_artifact(log_path).call(_image(2)))
    assert lg.shape == (2, H, W, NUM_CLASSES)
    np.testing.assert_array_equal(np.argmax(lg, axis=-1), pred)

    u8_path = str(tmp_path / "seg_u8.shlo")
    cli_main(["--export", u8_path, "--export_input", "uint8"] + base)
    u8 = export_lib.load_artifact(u8_path)
    assert np.dtype(u8.in_avals[0].dtype) == np.uint8
    pix = np.random.default_rng(1).integers(
        0, 256, (2, H, W, IN_CH)).astype(np.uint8)
    # On-device normalization must be bit-identical to the host's f32 math.
    np.testing.assert_array_equal(
        np.asarray(u8.call(pix)),
        np.asarray(seg.call(pix.astype(np.float32) / 127.5 - 1.0)))
    assert json.loads((tmp_path / "seg_u8.shlo.json").read_text())[
        "input_dtype"] == "uint8"

    with pytest.raises(ValueError, match="uint8"):
        cli_main(["--export", str(tmp_path / "bad.shlo"),
                  "--export_what", "generate", "--export_input", "uint8",
                  "--export_batch", "2"] + base)

    gen_path = str(tmp_path / "gen.shlo")
    cli_main(["--export", gen_path, "--export_what", "generate",
              "--export_batch", "2"] + base)
    gen = export_lib.load_artifact(gen_path)
    labels = np.random.default_rng(0).integers(
        0, NUM_CLASSES, (2, H, W)).astype(np.int32)
    img = np.asarray(gen.call(labels))
    assert img.shape == (2, H, W, IN_CH)
    assert np.all(np.abs(img) <= 1.0 + 1e-6)  # tanh head


def test_export_without_checkpoint_raises(tmp_path):
    cfg = _cfg(tmp_path)
    with pytest.raises(FileNotFoundError):
        export_lib.run_export(cfg, str(tmp_path / "x.shlo"))
