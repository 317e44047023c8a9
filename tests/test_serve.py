"""Standalone artifact serving (cyclegan_tpu/serve.py): .shlo + image dir ->
colorized predictions + optional scores, with NO checkpoint or trainer.

Proof obligations: predictions bit-match the live jitted predictor fed the
same eval transform; GT masks produce a scores.json with the metric family;
the CLI --serve mode drives the whole path; a non-segment artifact is
rejected with an actionable error.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cyclegan_tpu import export as export_lib
from cyclegan_tpu import serve as serve_lib
from cyclegan_tpu.main import main as cli_main
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

H, W = 24, 24
NUM_CLASSES, IN_CH = 21, 3
N_IMAGES = 5


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4, ndf=4,
                 bf16=False, crop_height=H, crop_width=W, batch_size=2,
                 pool_size=2, num_devices=1)
    trainer = CycleGANTrainer(cfg, NUM_CLASSES, IN_CH, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    exported = export_lib.export_predictor(
        trainer.predict, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    path = str(tmp / "model.shlo")
    export_lib.save_artifact(path, exported, manifest={
        "head": "segment", "num_classes": NUM_CLASSES})
    return path, trainer, state


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(N_IMAGES):
        # Off-size sources: the serve path must squash-resize to the
        # artifact's (H, W).
        arr = rng.integers(0, 256, (30, 40, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i:02d}.png")
    return str(d)


def test_serve_matches_live_predictor(artifact, image_dir, tmp_path):
    path, trainer, state = artifact
    out = str(tmp_path / "preds")
    res = serve_lib.run_serve(path, image_dir, out, batch_size=2)
    assert res["images"] == N_IMAGES
    names = sorted(os.listdir(out))
    assert names == [f"img_{i:02d}_pred.png" for i in range(N_IMAGES)]

    # Bit-parity with the live predictor on the same eval transform.
    batch = np.stack([
        serve_lib._load_image(os.path.join(image_dir, f"img_{i:02d}.png"),
                              (H, W), IN_CH, "resize")
        for i in range(N_IMAGES)])
    expect = np.asarray(jax.jit(trainer.predict)(state.g_i2l, batch))
    from cyclegan_tpu.data.palette import decode_colormap
    for i in range(N_IMAGES):
        # Predictions are P-mode palette PNGs: raw read = class indices,
        # RGB render = the VOC colorizer's output.
        with Image.open(os.path.join(out, f"img_{i:02d}_pred.png")) as im:
            assert im.mode == "P"
            got = np.asarray(im)
            rgb = np.asarray(im.convert("RGB"))
        np.testing.assert_array_equal(got, expect[i].astype(np.uint8))
        np.testing.assert_array_equal(
            rgb, decode_colormap(expect[i].astype(np.uint8)))


def test_serve_pipeline_depth_invariant(artifact, image_dir, tmp_path,
                                        monkeypatch):
    """The async one-deep fetch pipeline must be output-invariant: depth 0
    (serial fetch-per-chunk), the default depth 1, and a depth larger than
    the number of chunks all write identical PNGs and scores."""
    path, _, _ = artifact
    outs = {}
    for depth in ("0", "1", "7"):
        monkeypatch.setenv("CYCLEGAN_TPU_INFER_DEPTH", depth)
        out = str(tmp_path / f"preds_{depth}")
        res = serve_lib.run_serve(path, image_dir, out, batch_size=2)
        assert res["images"] == N_IMAGES
        outs[depth] = {
            n: np.asarray(Image.open(os.path.join(out, n)))
            for n in sorted(os.listdir(out))}
    assert outs["0"].keys() == outs["1"].keys() == outs["7"].keys()
    for n in outs["0"]:
        np.testing.assert_array_equal(outs["0"][n], outs["1"][n])
        np.testing.assert_array_equal(outs["0"][n], outs["7"][n])


@pytest.fixture(scope="module")
def uint8_artifact(artifact, tmp_path_factory):
    """Same weights exported with a uint8 input signature (normalization
    on-device — export.uint8_input)."""
    _, trainer, state = artifact
    exported = export_lib.export_predictor(
        export_lib.uint8_input(trainer.predict), state.g_i2l,
        height=H, width=W, in_channels=IN_CH, platforms=("cpu",),
        dtype=jnp.uint8)
    path = str(tmp_path_factory.mktemp("serve_u8") / "model_u8.shlo")
    export_lib.save_artifact(path, exported, manifest={
        "head": "segment", "num_classes": NUM_CLASSES,
        "input_dtype": "uint8"})
    return path


def test_uint8_artifact_serving_matches_float(artifact, uint8_artifact,
                                              image_dir, tmp_path):
    """A uint8-input artifact (host ships raw pixels, device normalizes)
    must write byte-identical prediction PNGs to the float32 artifact."""
    f32_path, _, _ = artifact
    out_f32 = str(tmp_path / "f32")
    out_u8 = str(tmp_path / "u8")
    serve_lib.run_serve(f32_path, image_dir, out_f32, batch_size=2)
    res = serve_lib.run_serve(uint8_artifact, image_dir, out_u8,
                              batch_size=2)
    assert res["images"] == N_IMAGES
    for i in range(N_IMAGES):
        name = f"img_{i:02d}_pred.png"
        a = (tmp_path / "f32" / name).read_bytes()
        b = (tmp_path / "u8" / name).read_bytes()
        assert a == b


def test_uint8_artifact_rejects_multiscale(uint8_artifact):
    with pytest.raises(ValueError, match="uint8"):
        serve_lib.build_predictor(uint8_artifact, scales=(0.75, 1.0))


def test_serve_scores_against_masks(artifact, image_dir, tmp_path, capsys):
    path, trainer, state = artifact
    gt = tmp_path / "gt"
    gt.mkdir()
    rng = np.random.default_rng(1)
    for i in range(N_IMAGES - 1):  # one image deliberately unscored
        mask = rng.integers(0, NUM_CLASSES, (30, 40), np.uint8)
        mask[0, :] = 255  # void border must be ignored, not crash
        Image.fromarray(mask, mode="L").save(gt / f"img_{i:02d}.png")
    out = str(tmp_path / "preds")
    res = serve_lib.run_serve(path, image_dir, out, batch_size=3,
                              gt_dir=str(gt))
    assert res["scored"] == N_IMAGES - 1
    for k in ("miou", "pixel_acc", "mean_acc", "fwiou"):
        assert 0.0 <= res[k] <= 1.0
    with open(os.path.join(out, "scores.json")) as f:
        written = json.load(f)
    assert written["scored"] == N_IMAGES - 1
    # Per-class IoU table (reference scores() output), keyed by class name.
    assert len(written["per_class_iou"]) == NUM_CLASSES
    assert all(0.0 <= v <= 1.0 for v in written["per_class_iou"].values())
    # The user-facing log reports the IMAGE count on the scored path (a
    # regression once reported num_classes after the class-name lookup
    # rebound the image-list variable).
    assert f"served {N_IMAGES} images" in capsys.readouterr().out


def test_serve_cli(artifact, image_dir, tmp_path):
    path, _, _ = artifact
    out = str(tmp_path / "cli_out")
    cli_main(["--serve", path, "--serve_input", image_dir,
              "--serve_output", out, "--serve_batch", "4",
              "--platform", "cpu"])
    assert len(os.listdir(out)) == N_IMAGES


@pytest.fixture(scope="module")
def logits_artifact(artifact, tmp_path_factory):
    path, trainer, state = artifact
    exported = export_lib.export_predictor(
        trainer.logits, state.g_i2l, height=H, width=W, in_channels=IN_CH,
        platforms=("cpu",))
    lpath = str(tmp_path_factory.mktemp("serve_logits") / "logits.shlo")
    export_lib.save_artifact(lpath, exported, manifest={
        "head": "logits", "num_classes": NUM_CLASSES})
    return lpath


def test_tiled_serving_matches_live_tiled_predict(logits_artifact, image_dir,
                                                  artifact, tmp_path):
    """Canvas serving: a logits-head artifact tiled over a 48x36 canvas
    must reproduce the framework's live tiled predictor exactly."""
    _, trainer, state = artifact
    out = str(tmp_path / "tiled")
    res = serve_lib.run_serve(logits_artifact, image_dir, out,
                              batch_size=2, canvas_hw=(48, 36))
    assert res["images"] == N_IMAGES

    from cyclegan_tpu import eval_tile
    batch = np.stack([
        serve_lib._load_image(os.path.join(image_dir, f"img_{i:02d}.png"),
                              (48, 36), IN_CH, "resize")
        for i in range(N_IMAGES)])
    expect = np.asarray(eval_tile.tiled_predict(
        trainer, state.g_i2l, batch, (H, W)))
    for i in range(N_IMAGES):
        got = np.asarray(Image.open(os.path.join(out, f"img_{i:02d}_pred.png")))
        assert got.shape[:2] == (48, 36)
        np.testing.assert_array_equal(got, expect[i].astype(np.uint8))


def test_logits_head_plain_serving_matches_segment(logits_artifact, artifact,
                                                   image_dir, tmp_path):
    """A logits artifact served WITHOUT a canvas argmaxes server-side and
    must match the segment artifact's output PNGs."""
    path, _, _ = artifact
    out_seg = str(tmp_path / "seg")
    out_log = str(tmp_path / "log")
    serve_lib.run_serve(path, image_dir, out_seg, batch_size=3)
    serve_lib.run_serve(logits_artifact, image_dir, out_log, batch_size=3)
    for i in range(N_IMAGES):
        a = np.asarray(Image.open(os.path.join(out_seg, f"img_{i:02d}_pred.png")))
        b = np.asarray(Image.open(os.path.join(out_log, f"img_{i:02d}_pred.png")))
        np.testing.assert_array_equal(a, b)


def test_tiled_serving_requires_logits_head(artifact, image_dir, tmp_path):
    path, _, _ = artifact  # segment head
    with pytest.raises(ValueError, match="logits"):
        serve_lib.run_serve(path, image_dir, str(tmp_path / "x"),
                            canvas_hw=(48, 36))


def test_serve_rejects_duplicate_stems_and_tile(artifact, tmp_path):
    """Same-stem inputs would silently overwrite predictions and
    double-count scores (outputs/GT are stem-keyed) — reject loudly; and
    eval_resize='tile' is a framework mode serve can't honor (fixed
    crop-sized artifact input)."""
    path, _, _ = artifact
    d = tmp_path / "dup"
    d.mkdir()
    arr = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    Image.fromarray(arr).save(d / "a.jpg")
    with pytest.raises(ValueError, match="duplicate image stem"):
        serve_lib.run_serve(path, str(d), str(tmp_path / "o1"))
    (d / "a.jpg").unlink()
    with pytest.raises(ValueError, match="resize|center_crop"):
        serve_lib.run_serve(path, str(d), str(tmp_path / "o2"),
                            eval_resize="tile")


def test_dp_serving_matches_single_device(artifact, image_dir, tmp_path):
    """data_parallel=True shards each batch over the 8 virtual devices
    (conftest mesh) and must be bit-identical to single-device serving —
    including the ragged final batch (5 images, batch 8 -> pad 3)."""
    path, _, _ = artifact
    assert len(jax.devices()) > 1  # conftest provides the 8-device host
    out_1 = str(tmp_path / "single")
    out_dp = str(tmp_path / "dp")
    serve_lib.run_serve(path, image_dir, out_1, batch_size=8)
    res = serve_lib.run_serve(path, image_dir, out_dp, batch_size=8,
                              data_parallel=True)
    assert res["images"] == N_IMAGES
    for i in range(N_IMAGES):
        a = np.asarray(Image.open(os.path.join(out_1, f"img_{i:02d}_pred.png")))
        b = np.asarray(Image.open(os.path.join(out_dp, f"img_{i:02d}_pred.png")))
        np.testing.assert_array_equal(a, b)


def test_dp_serving_cli(artifact, image_dir, tmp_path):
    path, _, _ = artifact
    out = str(tmp_path / "cli_dp")
    cli_main(["--serve", path, "--serve_input", image_dir,
              "--serve_output", out, "--serve_batch", "8", "--serve_dp",
              "--platform", "cpu"])
    assert len(os.listdir(out)) == N_IMAGES


def test_serve_rejects_generate_head(artifact, image_dir, tmp_path):
    path, trainer, state = artifact
    spec = jax.ShapeDtypeStruct((2, H, W), jnp.int32)
    exported = export_lib.export_closed(trainer.generate_image, state.g_l2i,
                                        spec, platforms=("cpu",))
    gen_path = str(tmp_path / "gen.shlo")
    export_lib.save_artifact(gen_path, exported, manifest={"head": "generate"})
    with pytest.raises(ValueError, match="generate"):
        serve_lib.run_serve(gen_path, image_dir, str(tmp_path / "x"))
