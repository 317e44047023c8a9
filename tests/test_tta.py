"""Horizontal-flip test-time augmentation (cyclegan_tpu/tta.py) — beyond
the reference's single-forward eval (SURVEY.md §3c).

Proof obligations: flip_avg computes 0.5*(f(x) + hflip(f(hflip(x)))) in
f32; the runner's eval/predict honor --eval_flip in both plain and tile
modes (matching a by-hand computation on the real generator); TTA output
is flip-equivariant; standalone serving honors flip= on logits-head
artifacts, bit-matching the live flipped predictor, and rejects argmax
heads.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cyclegan_tpu import export as export_lib
from cyclegan_tpu import serve as serve_lib
from cyclegan_tpu import tta
from cyclegan_tpu.main import main as cli_main
from cyclegan_tpu.train import runner
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

H, W = 24, 24
NUM_CLASSES, IN_CH = 5, 3


@pytest.fixture(scope="module")
def setup():
    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4, ndf=4,
                 bf16=False, crop_height=H, crop_width=W, batch_size=2,
                 pool_size=2, num_devices=1)
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return cfg, trainer, state


def _images(n, h=H, w=W, seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, h, w, IN_CH)).astype(np.float32)


def test_flip_avg_math():
    """flip_avg == 0.5*(f(x) + hflip(f(hflip(x)))) on a handmade f."""
    def f(params, x):  # asymmetric in W so the flip actually matters
        return jnp.stack([x[..., 0], jnp.cumsum(x[..., 0], axis=2)], -1)

    x = jnp.asarray(_images(2))
    got = tta.flip_avg(f)(None, x)
    manual = 0.5 * (f(None, x) + f(None, x[:, :, ::-1, :])[:, :, ::-1, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual), rtol=1e-6)
    assert got.dtype == jnp.float32


def test_flip_avg_is_flip_equivariant(setup):
    """TTA logits of the mirrored image are the mirror of the TTA logits —
    the symmetry the trick is built on, on the real generator."""
    _, trainer, state = setup
    fn = tta.flip_avg(trainer.logits)
    x = jnp.asarray(_images(1))
    a = np.asarray(fn(state.g_i2l, x))
    b = np.asarray(fn(state.g_i2l, x[:, :, ::-1, :]))[:, :, ::-1, :]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_runner_eval_flip_plain(setup):
    """--eval_flip true: runner predict == argmax of the by-hand TTA
    average; eval_step's confusion matrix follows the same argmax."""
    cfg, trainer, state = setup
    _, predict = runner._make_eval_fns(cfg.replace(eval_flip=True), trainer)
    x = jnp.asarray(_images(2))
    manual = np.argmax(
        0.5 * (np.asarray(trainer.logits(state.g_i2l, x))
               + np.asarray(trainer.logits(
                   state.g_i2l, x[:, :, ::-1, :]))[:, :, ::-1, :]),
        axis=-1)
    np.testing.assert_array_equal(np.asarray(predict(state.g_i2l, x)), manual)

    # ... and differs somewhere from the non-flip argmax on an untrained
    # net (otherwise this test proves nothing).
    plain = np.asarray(jax.jit(trainer.predict)(state.g_i2l, x))
    assert (plain != manual).any()


def test_runner_eval_flip_tile(setup):
    """eval_resize=tile + eval_flip compose: the flip wraps the WHOLE
    tiled canvas (mirror pass re-tiles the flipped canvas)."""
    from cyclegan_tpu.eval_tile import tiled_logits

    cfg, trainer, state = setup
    canvas = (32, 40)
    cfg2 = cfg.replace(eval_resize="tile", eval_flip=True,
                       resize_height=canvas[0], resize_width=canvas[1])
    _, predict = runner._make_eval_fns(cfg2, trainer)
    x = jnp.asarray(_images(1, *canvas))

    def canvas_logits(img):
        return np.asarray(tiled_logits(trainer.logits, state.g_i2l,
                                       jnp.asarray(img), (H, W)))

    manual = np.argmax(
        0.5 * (canvas_logits(x)
               + canvas_logits(np.asarray(x)[:, :, ::-1, :])[:, :, ::-1, :]),
        axis=-1)
    np.testing.assert_array_equal(np.asarray(predict(state.g_i2l, x)), manual)


def test_serve_flip_matches_live(setup, tmp_path):
    """flip=True on a logits-head artifact bit-matches the live flipped
    predictor; a segment-head artifact is rejected."""
    _, trainer, state = setup
    exported = export_lib.export_predictor(
        trainer.logits, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    path = str(tmp_path / "logits.shlo")
    export_lib.save_artifact(path, exported, manifest={
        "head": "logits", "num_classes": NUM_CLASSES})

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (30, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")

    out = str(tmp_path / "preds")
    res = serve_lib.run_serve(path, str(img_dir), out, batch_size=2,
                              flip=True)
    assert res["images"] == 3

    batch = np.stack([
        serve_lib._load_image(str(img_dir / f"im{i}.png"), (H, W), IN_CH,
                              "resize") for i in range(3)])
    expect = np.asarray(jax.jit(lambda p, x: jnp.argmax(
        tta.flip_avg(trainer.logits)(p, x), axis=-1))(state.g_i2l, batch))
    for i in range(3):
        # P-mode palette prediction PNGs read back as class indices.
        got = np.asarray(Image.open(os.path.join(out, f"im{i}_pred.png")))
        np.testing.assert_array_equal(got, expect[i].astype(np.uint8))

    seg = export_lib.export_predictor(
        trainer.predict, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    seg_path = str(tmp_path / "seg.shlo")
    export_lib.save_artifact(seg_path, seg, manifest={
        "head": "segment", "num_classes": NUM_CLASSES})
    with pytest.raises(ValueError, match="serve_flip"):
        serve_lib.run_serve(seg_path, str(img_dir), out, flip=True)


def test_parse_scales():
    assert tta.parse_scales(None) is None
    assert tta.parse_scales("") is None
    assert tta.parse_scales("0.75,1.0,1.25") == (0.75, 1.0, 1.25)
    with pytest.raises(ValueError, match="eval_scales"):
        tta.parse_scales("1.0,-2")


def test_scale_avg_math(setup):
    """scale_avg == mean over scales of resize-run-resize-back, snapped to
    /4 dims, on the real generator."""
    _, trainer, state = setup
    scales = (0.5, 1.0, 1.5)
    fn = tta.scale_avg(trainer.logits, scales)
    x = jnp.asarray(_images(2))
    got = np.asarray(fn(state.g_i2l, x))

    acc = np.zeros((2, H, W, NUM_CLASSES), np.float32)
    for s in scales:
        hs = max(round(H * s / 4) * 4, 4)
        ws = max(round(W * s / 4) * 4, 4)
        if (hs, ws) == (H, W):
            acc += np.asarray(trainer.logits(state.g_i2l, x))
        else:
            xs = jax.image.resize(x, (2, hs, ws, IN_CH), "linear")
            lo = trainer.logits(state.g_i2l, xs).astype(jnp.float32)
            acc += np.asarray(jax.image.resize(
                lo, (2, H, W, NUM_CLASSES), "linear"))
    np.testing.assert_allclose(got, acc / len(scales), atol=1e-5)


def test_runner_eval_scales_with_flip(setup):
    """--eval_scales + --eval_flip: runner predict == argmax of
    scale_avg(flip_avg(logits)) — average over scales x mirror."""
    cfg, trainer, state = setup
    _, predict = runner._make_eval_fns(
        cfg.replace(eval_flip=True, eval_scales="0.5,1.0"), trainer)
    x = jnp.asarray(_images(2))
    manual_fn = tta.scale_avg(tta.flip_avg(trainer.logits), (0.5, 1.0))
    manual = np.argmax(np.asarray(manual_fn(state.g_i2l, x)), axis=-1)
    np.testing.assert_array_equal(np.asarray(predict(state.g_i2l, x)), manual)


def test_serve_scales_tiled(setup, tmp_path):
    """Tiled serving + scales bit-matches the live scale-averaged tiled
    predictor; scales without a canvas are rejected."""
    from cyclegan_tpu.eval_tile import tiled_logits

    _, trainer, state = setup
    exported = export_lib.export_predictor(
        trainer.logits, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    path = str(tmp_path / "logits.shlo")
    export_lib.save_artifact(path, exported, manifest={
        "head": "logits", "num_classes": NUM_CLASSES})

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (50, 60, 3), np.uint8)).save(
            img_dir / f"im{i}.png")

    canvas, scales = (32, 40), (1.0, 1.25)
    out = str(tmp_path / "preds")
    res = serve_lib.run_serve(path, str(img_dir), out, batch_size=2,
                              canvas_hw=canvas, scales=scales)
    assert res["images"] == 2

    batch = np.stack([
        serve_lib._load_image(str(img_dir / f"im{i}.png"), canvas, IN_CH,
                              "resize") for i in range(2)])
    live = tta.scale_avg(
        lambda p, x: tiled_logits(trainer.logits, p, x, (H, W)), scales)
    expect = np.argmax(np.asarray(live(state.g_i2l, jnp.asarray(batch))),
                       axis=-1)
    for i in range(2):
        got = np.asarray(Image.open(os.path.join(out, f"im{i}_pred.png")))
        np.testing.assert_array_equal(got, expect[i].astype(np.uint8))

    with pytest.raises(ValueError, match="serve_scales"):
        serve_lib.run_serve(path, str(img_dir), out, scales=scales)
    with pytest.raises(ValueError, match="sliding window"):
        serve_lib.run_serve(path, str(img_dir), out, canvas_hw=canvas,
                            scales=(0.5,))


def test_cli_testing_eval_flip(tmp_path):
    """Full CLI drive: train 2 steps on synthetic, then --testing with
    --eval_flip true produces scores."""
    ckpt, res = str(tmp_path / "ckpt"), str(tmp_path / "res")
    base = ["--dataset", "synthetic", "--gen_net", "resnet_6blocks",
            "--ngf", "4", "--ndf", "4", "--no_bf16",
            "--crop_height", str(H), "--crop_width", str(W),
            "--batch_size", "2", "--pool_size", "2", "--platform", "cpu",
            "--num_devices", "1",
            "--checkpoint_dir", ckpt, "--results_dir", res]
    cli_main(["--training", "--max_steps", "2", "--epochs", "1"] + base)
    cli_main(["--testing", "--eval_flip", "true",
              "--eval_scales", "0.5,1.0"] + base)
    preds = [n for n in os.listdir(res) if n.startswith("pred_")]
    assert preds  # colorized prediction PNGs landed


def test_validate_tile_scales_matches_scale_avg_snap():
    """snapped_dims is the single source of truth: the validator's
    arithmetic equals what scale_avg actually runs at."""
    for h, w, s in [(256, 256, 0.75), (192, 320, 0.5), (24, 24, 1.25),
                    (100, 100, 0.03)]:
        hs, ws = tta.snapped_dims(h, w, s)
        assert hs == max(round(h * s / 4) * 4, 4)
        assert ws == max(round(w * s / 4) * 4, 4)
    # ok: every snapped canvas >= window
    tta.validate_tile_scales((256, 256), (224, 224), (1.0, 1.25))
    tta.validate_tile_scales((256, 256), (224, 224), None)
    # 0.75 snaps 256 -> 192 < 224: rejected
    with pytest.raises(ValueError, match="192x192"):
        tta.validate_tile_scales((256, 256), (224, 224), (0.75, 1.0))


def test_runner_tile_scales_rejected_at_setup(setup):
    """--eval_resize tile + a window-shrinking scale fails at setup
    (_make_eval_fns), not after the first training epoch."""
    cfg, trainer, _ = setup
    bad = cfg.replace(eval_resize="tile", resize_height=32, resize_width=32,
                      eval_scales="0.5,1.0")
    with pytest.raises(ValueError, match="sliding window"):
        runner._make_eval_fns(bad, trainer)
    ok = cfg.replace(eval_resize="tile", resize_height=48, resize_width=48,
                     eval_scales="0.5,1.0")
    runner._make_eval_fns(ok, trainer)  # 0.5 snaps 48 -> 24 == window: fine
