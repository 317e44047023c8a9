"""Directory-convention dataset readers against miniature on-disk trees
(the real corpora are absent in this environment — SURVEY.md §7 item 3)."""

import numpy as np
import pytest
from PIL import Image

from cyclegan_tpu.data.datasets import make_dataset
from cyclegan_tpu.data.loader import Loader
from cyclegan_tpu.data.palette import voc_colormap


def _write_voc(root, names):
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    sets = root / "ImageSets" / "Segmentation"
    sets.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for n in names:
        img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        lab = rng.integers(0, 21, (40, 60)).astype(np.uint8)
        p = Image.fromarray(lab, mode="P")
        p.putpalette(voc_colormap(256).flatten())
        p.save(root / "SegmentationClass" / f"{n}.png")
    (sets / "train.txt").write_text("\n".join(names) + "\n")
    (sets / "val.txt").write_text("\n".join(names[:1]) + "\n")


class TestVOCReader:
    def test_reads_palette_labels(self, tmp_path):
        _write_voc(tmp_path, ["a", "b", "c"])
        ds = make_dataset("voc2012", str(tmp_path), split="train")
        assert len(ds) == 3
        img, lab = ds.get(0)
        assert img.shape == (40, 60, 3) and img.dtype == np.uint8
        assert lab.shape == (40, 60) and lab.max() < 21
        loader = Loader(ds, batch_size=2, crop_hw=(32, 32), train=True, seed=0)
        batch = next(iter(loader.epoch(0)))
        assert batch["image"].shape == (2, 32, 32, 3)
        assert batch["label"].shape == (2, 32, 32)

    def test_subset_size(self, tmp_path):
        _write_voc(tmp_path, ["a", "b", "c"])
        ds = make_dataset("voc2012", str(tmp_path), split="train", size=2)
        assert len(ds) == 2

    def test_missing_root_raises(self):
        with pytest.raises(FileNotFoundError):
            make_dataset("voc2012", "/nonexistent/path")

    def test_rgb_encoded_masks_decode_to_class_ids(self, tmp_path):
        """RGB-saved palette masks must go through the colormap codec — PIL
        convert('P') would quantize to the web palette and corrupt labels
        (ADVICE.md round-1 medium finding)."""
        from cyclegan_tpu.data.palette import decode_colormap

        (tmp_path / "JPEGImages").mkdir(parents=True)
        (tmp_path / "SegmentationClass").mkdir()
        sets = tmp_path / "ImageSets" / "Segmentation"
        sets.mkdir(parents=True)
        lab = np.zeros((16, 16), np.uint8)
        lab[:8] = 1
        lab[8:, :8] = 15
        lab[8:, 8:] = 255  # void border
        rgb = decode_colormap(lab)  # save the mask as plain RGB
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            tmp_path / "JPEGImages" / "x.jpg")
        Image.fromarray(rgb).save(tmp_path / "SegmentationClass" / "x.png")
        (sets / "train.txt").write_text("x\n")
        ds = make_dataset("voc2012", str(tmp_path), split="train")
        _, got = ds.get(0)
        np.testing.assert_array_equal(got, lab)


class TestCityscapesReader:
    def test_reads_train_ids(self, tmp_path):
        img_dir = tmp_path / "leftImg8bit" / "train" / "city1"
        lab_dir = tmp_path / "gtFine" / "train" / "city1"
        img_dir.mkdir(parents=True)
        lab_dir.mkdir(parents=True)
        rng = np.random.default_rng(1)
        for i in range(2):
            base = f"city1_{i:06d}_000019"
            Image.fromarray(rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)) \
                .save(img_dir / f"{base}_leftImg8bit.png")
            Image.fromarray(rng.integers(0, 19, (64, 128)).astype(np.uint8)) \
                .save(lab_dir / f"{base}_gtFine_labelTrainIds.png")
        ds = make_dataset("cityscapes", str(tmp_path), split="train")
        assert len(ds) == 2
        img, lab = ds.get(0)
        assert img.shape == (64, 128, 3) and lab.max() < 19


class TestACDCReader:
    def test_reads_grayscale(self, tmp_path):
        for sub in ("images", "labels"):
            (tmp_path / "train" / sub).mkdir(parents=True)
        rng = np.random.default_rng(2)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (48, 48)).astype(np.uint8)) \
                .save(tmp_path / "train" / "images" / f"s{i}.png")
            Image.fromarray(rng.integers(0, 4, (48, 48)).astype(np.uint8)) \
                .save(tmp_path / "train" / "labels" / f"s{i}.png")
        ds = make_dataset("acdc", str(tmp_path), split="train")
        assert len(ds) == 3
        img, lab = ds.get(1)
        assert img.shape == (48, 48, 1)  # grayscale 1-channel
        assert lab.max() < 4
