"""Weight-only int8 quantized export (export.py::quantize_weights /
``--export_quantize int8``): the artifact embeds conv kernels as int8 +
per-channel scales and dequantizes on the fly.

Proof obligations: quantize->dequantize round-trip error is bounded by the
symmetric-int8 step (scale/2 per weight); the quantized artifact is
substantially smaller and its predictions agree with fp32 on almost every
pixel; the CLI drives it and the standalone server consumes it unchanged.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu import export as export_lib
from cyclegan_tpu.train.checkpoint import CheckpointManager
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

H = W = 24
NUM_CLASSES, IN_CH = 21, 3


def _cfg(tmp, **kw) -> Config:
    return Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=16,
                  ndf=8, bf16=False, crop_height=H, crop_width=W,
                  batch_size=2, pool_size=2, num_devices=1,
                  checkpoint_dir=str(tmp / "ckpt"),
                  results_dir=str(tmp / "out"), **kw)


def _setup(tmp):
    cfg = _cfg(tmp)
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return cfg, trainer, state


def _image(batch, seed=0):
    return np.asarray(jax.random.uniform(
        jax.random.PRNGKey(seed), (batch, H, W, IN_CH), jnp.float32,
        -1.0, 1.0))


def test_quantize_roundtrip_error_bound(tmp_path):
    _, trainer, state = _setup(tmp_path)
    q = export_lib.quantize_weights(state.g_i2l)
    deq = export_lib.dequantize_weights(q)
    n_quantized = 0
    for orig, back in zip(jax.tree.leaves(state.g_i2l),
                          jax.tree.leaves(jax.tree.map(np.asarray, deq))):
        orig = np.asarray(orig)
        if orig.shape != np.asarray(back).shape:
            continue
        err = np.abs(orig - np.asarray(back))
        if err.max() > 0:
            n_quantized += 1
            # symmetric int8 rounding: |err| <= scale/2 = max|w|/254 per cout
            flat = orig.reshape(-1, orig.shape[-1])
            bound = np.max(np.abs(flat), axis=0) / 254.0 + 1e-12
            assert (err.reshape(-1, orig.shape[-1]) <= bound + 1e-9).all()
    assert n_quantized >= 10  # the conv kernels actually got quantized


def test_quantized_artifact_smaller_and_accurate(tmp_path):
    _, trainer, state = _setup(tmp_path)
    spec = jax.ShapeDtypeStruct(
        (export_lib._batch_dim("b"), H, W, IN_CH), jnp.float32)

    full = export_lib.export_closed(trainer.logits, state.g_i2l, spec,
                                    platforms=("cpu",))
    qparams = export_lib.quantize_weights(state.g_i2l)
    quant = export_lib.export_closed(
        lambda p, x: trainer.logits(export_lib.dequantize_weights(p), x),
        qparams, spec, platforms=("cpu",))

    size_full, size_q = len(full.serialize()), len(quant.serialize())
    assert size_q < size_full / 2.5, (size_full, size_q)

    x = _image(2)
    lf = np.asarray(jax.export.deserialize(full.serialize()).call(x))
    lq = np.asarray(jax.export.deserialize(quant.serialize()).call(x))
    # weight-only int8 on an untrained net: logits stay close...
    assert np.max(np.abs(lf - lq)) < 0.05 * (np.abs(lf).max() + 1e-9)
    # ...and argmax predictions agree almost everywhere. An UNTRAINED net
    # is the worst case here (21 near-tied, near-zero logits — rounding
    # noise flips the argmax most easily); trained nets have decisive
    # margins.
    agree = np.mean(lf.argmax(-1) == lq.argmax(-1))
    assert agree > 0.95, agree


def test_bf16_mode_size_and_error(tmp_path):
    """mode='bf16': ~2x smaller artifact, error bounded by bf16 rounding
    (relative 2^-8 — bf16 keeps fp32's exponent, 8 total mantissa bits)."""
    import pytest
    _, trainer, state = _setup(tmp_path)
    q = export_lib.quantize_weights(state.g_i2l, mode="bf16")
    deq = export_lib.dequantize_weights(q)
    n_quantized = 0
    for orig, back in zip(jax.tree.leaves(state.g_i2l),
                          jax.tree.leaves(jax.tree.map(np.asarray, deq))):
        orig, back = np.asarray(orig), np.asarray(back)
        err = np.abs(orig - back)
        if err.max() > 0:
            n_quantized += 1
        assert (err <= np.abs(orig) * 2.0**-8 + 1e-12).all()
    assert n_quantized >= 10

    spec = jax.ShapeDtypeStruct(
        (export_lib._batch_dim("b"), H, W, IN_CH), jnp.float32)
    full = export_lib.export_closed(trainer.logits, state.g_i2l, spec,
                                    platforms=("cpu",))
    quant = export_lib.export_closed(
        lambda p, x: trainer.logits(export_lib.dequantize_weights(p), x),
        q, spec, platforms=("cpu",))
    size_full, size_q = len(full.serialize()), len(quant.serialize())
    assert size_q < size_full / 1.6, (size_full, size_q)

    with pytest.raises(ValueError, match="unknown quantization"):
        export_lib.quantize_weights(state.g_i2l, mode="fp4")


def test_savedmodel_quantized_export(tmp_path):
    """--export_format savedmodel composes with --export_quantize: the
    TF-Serving container carries the quantized module and its predictions
    track the live fp32 predictor."""
    import pytest
    tf = pytest.importorskip("tensorflow")
    from cyclegan_tpu.main import main as cli_main

    cfg, trainer, state = _setup(tmp_path)
    mngr = CheckpointManager(cfg.checkpoint_dir)
    mngr.save(0, jax.device_get(state))
    mngr.wait()
    mngr.close()

    out_dir = str(tmp_path / "sm_q8")
    cli_main(["--export", out_dir, "--export_format", "savedmodel",
              "--export_quantize", "int8", "--export_platforms", "cpu",
              "--dataset", "synthetic", "--gen_net", "resnet_6blocks",
              "--ngf", "16", "--ndf", "8", "--no_bf16",
              "--crop_height", str(H), "--crop_width", str(W),
              "--pool_size", "2", "--platform", "cpu",
              "--checkpoint_dir", cfg.checkpoint_dir,
              "--results_dir", cfg.results_dir])
    with open(os.path.join(out_dir, "cyclegan_tpu_manifest.json")) as f:
        assert json.load(f)["quantize"] == "int8_weight_only"

    serve = tf.saved_model.load(out_dir).signatures["serving_default"]
    x = _image(2)
    (got,) = serve(input=tf.constant(x)).values()
    ref = np.asarray(jax.jit(trainer.predict)(state.g_i2l, x))
    agree = np.mean(np.asarray(got) == ref)
    assert agree > 0.95, agree  # untrained-net worst case, see above


def test_cli_quantized_export_serves(tmp_path):
    """--export_quantize int8 through the CLI; the standalone server
    consumes the quantized artifact unchanged."""
    from cyclegan_tpu.main import main as cli_main
    from cyclegan_tpu import serve as serve_lib
    from PIL import Image

    cfg, trainer, state = _setup(tmp_path)
    mngr = CheckpointManager(cfg.checkpoint_dir)
    mngr.save(0, jax.device_get(state))
    mngr.wait()
    mngr.close()

    art = str(tmp_path / "q.shlo")
    cli_main(["--export", art, "--export_quantize", "int8",
              "--export_platforms", "cpu", "--dataset", "synthetic",
              "--gen_net", "resnet_6blocks", "--ngf", "16", "--ndf", "8",
              "--no_bf16", "--crop_height", str(H), "--crop_width", str(W),
              "--pool_size", "2", "--platform", "cpu",
              "--checkpoint_dir", cfg.checkpoint_dir,
              "--results_dir", cfg.results_dir])
    with open(art + ".json") as f:
        assert json.load(f)["quantize"] == "int8_weight_only"

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    rgb = ((_image(1)[0] + 1) * 127.5).astype(np.uint8)
    Image.fromarray(rgb).save(in_dir / "a.png")
    out = serve_lib.run_serve(art, str(in_dir), str(tmp_path / "preds"),
                              batch_size=1)
    assert (tmp_path / "preds" / "a_pred.png").exists()
    assert out["images"] == 1
