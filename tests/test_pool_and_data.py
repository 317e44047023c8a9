"""Image-pool distribution test + data pipeline tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.data import palette
from cyclegan_tpu.data.datasets import make_dataset, split_labeled
from cyclegan_tpu.data.loader import Loader, paired_iterator
from cyclegan_tpu.data import transforms
from cyclegan_tpu.train.pool import init_pool, pool_query


class TestPool:
    def test_fills_then_swaps(self):
        pool = init_pool(4, (2, 2, 1))
        rng = jax.random.PRNGKey(0)
        # While filling, every query returns the new item.
        for i in range(4):
            item = jnp.full((1, 2, 2, 1), float(i))
            rng, k = jax.random.split(rng)
            pool, out = pool_query(pool, item, k)
            assert float(out[0, 0, 0, 0]) == float(i)
        assert int(pool.count) == 4

    def test_swap_distribution(self):
        """Once full: ~50% of queries return a stored (old) image."""
        pool = init_pool(8, (1, 1, 1))
        rng = jax.random.PRNGKey(1)
        for i in range(8):
            rng, k = jax.random.split(rng)
            pool, _ = pool_query(pool, jnp.full((1, 1, 1, 1), -1.0), k)
        n_old = 0
        trials = 400
        query = jax.jit(pool_query)
        for i in range(trials):
            rng, k = jax.random.split(rng)
            pool, out = query(pool, jnp.full((1, 1, 1, 1), float(i)), k)
            if float(out[0, 0, 0, 0]) != float(i):
                n_old += 1
        assert 0.38 < n_old / trials < 0.62  # p=0.5 swap

    def test_batch_sequential_semantics(self):
        """Items within a batch see each other's pool updates (scan order)."""
        pool = init_pool(1, (1, 1, 1))
        items = jnp.arange(3, dtype=jnp.float32).reshape(3, 1, 1, 1)
        pool, outs = pool_query(pool, items, jax.random.PRNGKey(2))
        # First item fills the pool and is returned as-is.
        assert float(outs[0, 0, 0, 0]) == 0.0


class TestPalette:
    def test_roundtrip(self):
        labels = np.random.default_rng(0).integers(0, 21, (16, 16)).astype(np.uint8)
        rgb = palette.decode_colormap(labels)
        back = palette.encode_colormap(rgb)
        np.testing.assert_array_equal(back, labels)

    def test_void_color(self):
        rgb = np.full((4, 4, 3), 11, np.uint8)  # not a palette color
        assert (palette.encode_colormap(rgb) == 255).all()

    def test_one_hot_shapes_and_ignore(self):
        labels = np.array([[0, 1], [255, 20]])
        oh = palette.one_hot(labels, 21)
        assert oh.shape == (2, 2, 21)
        assert oh[1, 0].sum() == 0  # ignored pixel all-zero
        assert oh[0, 1, 1] == 1 and oh[1, 1, 20] == 1

    def test_palette_png_roundtrip(self, tmp_path):
        """P-mode prediction PNGs: raw read = indices, RGB render =
        decode_colormap, and the serve mask reader sees plain indices."""
        from PIL import Image

        labels = np.random.default_rng(1).integers(
            0, 21, (16, 16)).astype(np.uint8)
        labels[0, :4] = 255  # void survives too
        p = str(tmp_path / "pred.png")
        palette.save_prediction_png(labels, p)
        with Image.open(p) as im:
            assert im.mode == "P"
            np.testing.assert_array_equal(np.asarray(im), labels)
            np.testing.assert_array_equal(
                np.asarray(im.convert("RGB")),
                palette.decode_colormap(labels))
        from cyclegan_tpu.serve import _load_mask
        np.testing.assert_array_equal(
            _load_mask(p, (16, 16), 21, "resize"), labels)

    def test_prediction_png_rgb_fallback(self, tmp_path, monkeypatch):
        from PIL import Image

        monkeypatch.setenv("CYCLEGAN_TPU_PRED_PNG", "rgb")
        labels = np.random.default_rng(2).integers(
            0, 21, (8, 8)).astype(np.uint8)
        p = str(tmp_path / "pred.png")
        palette.save_prediction_png(labels, p)
        with Image.open(p) as im:
            assert im.mode == "RGB"
            np.testing.assert_array_equal(
                np.asarray(im), palette.decode_colormap(labels))


class TestTransforms:
    def test_deterministic_under_seed(self):
        img = np.random.default_rng(1).integers(0, 255, (40, 60, 3)).astype(np.uint8)
        lab = np.random.default_rng(2).integers(0, 21, (40, 60)).astype(np.uint8)
        a = transforms.train_transform(img, lab, crop_hw=(32, 32),
                                       rng=np.random.default_rng(7))
        b = transforms.train_transform(img, lab, crop_hw=(32, 32),
                                       rng=np.random.default_rng(7))
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_fixed_output_shape_small_input(self):
        img = np.zeros((20, 25, 3), np.uint8)
        lab = np.zeros((20, 25), np.uint8)
        out_img, out_lab = transforms.train_transform(
            img, lab, crop_hw=(64, 64), rng=np.random.default_rng(0))
        assert out_img.shape == (64, 64, 3) and out_lab.shape == (64, 64)

    def test_normalize_range(self):
        img = np.array([[[0, 128, 255]]], np.uint8)
        out = transforms.normalize(img)
        assert out.min() >= -1.0 and out.max() <= 1.0
        assert abs(out[0, 0, 0] + 1.0) < 1e-6 and abs(out[0, 0, 2] - 1.0) < 1e-6

    def test_grayscale_resize_keeps_channel(self):
        """(H, W, 1) ACDC samples must survive every resize path — PIL
        rejects trailing-1 arrays (ADVICE.md round-1 medium finding)."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (20, 30, 1)).astype(np.uint8)
        lab = rng.integers(0, 4, (20, 30)).astype(np.uint8)
        out, lab_out = transforms.resize_pair(img, lab, (48, 64))
        assert out.shape == (48, 64, 1) and lab_out.shape == (48, 64)
        # eval path (always resizes)
        e_img, e_lab = transforms.eval_transform(img, lab, crop_hw=(32, 32))
        assert e_img.shape == (32, 32, 1) and e_lab.shape == (32, 32)
        # train path with upscale-before-crop
        t_img, t_lab = transforms.train_transform(
            img, lab, crop_hw=(64, 64), rng=np.random.default_rng(0))
        assert t_img.shape == (64, 64, 1) and t_lab.shape == (64, 64)


class TestDatasets:
    def test_synthetic_loader_shapes(self):
        ds = make_dataset("synthetic", size=8)
        loader = Loader(ds, batch_size=4, crop_hw=(64, 64), train=True, seed=0)
        batch = next(iter(loader.epoch(0)))
        assert batch["image"].shape == (4, 64, 64, 3)
        assert batch["label"].shape == (4, 64, 64)
        assert batch["image"].dtype == np.float32
        assert batch["label"].dtype == np.int32

    def test_split_labeled_fraction(self):
        ds = make_dataset("synthetic", size=32)
        lab, unlab = split_labeled(ds, 0.25, seed=0)
        assert len(lab) == 8 and len(unlab) == 24
        # Deterministic under the same seed
        lab2, _ = split_labeled(ds, 0.25, seed=0)
        assert list(lab.items) == list(lab2.items)

    def test_paired_iterator_zip_default(self):
        """Reference semantics (SURVEY.md §3a): zip -> epoch ends at the
        shorter (labeled) stream; labeled batches never repeat in-epoch."""
        ds = make_dataset("synthetic", size=32)
        lab_ds, unlab_ds = split_labeled(ds, 0.25, seed=0)  # 8 lab / 24 unlab
        lab_l = Loader(lab_ds, batch_size=2, crop_hw=(32, 32), seed=0)
        unlab_l = Loader(unlab_ds, batch_size=2, crop_hw=(32, 32), seed=1)
        pairs = list(paired_iterator(lab_l, unlab_l, epoch=0))
        assert len(pairs) == lab_l.steps_per_epoch() == 4
        from cyclegan_tpu.data.loader import paired_steps_per_epoch

        assert paired_steps_per_epoch(lab_l, unlab_l) == 4
        assert paired_steps_per_epoch(lab_l, unlab_l, "cycle") == 12

    def test_paired_iterator_cycles_labeled(self):
        ds = make_dataset("synthetic", size=16)
        lab_ds, unlab_ds = split_labeled(ds, 0.125, seed=0)  # 2 labeled
        lab_l = Loader(lab_ds, batch_size=2, crop_hw=(32, 32), seed=0)
        unlab_l = Loader(unlab_ds, batch_size=2, crop_hw=(32, 32), seed=1)
        pairs = list(paired_iterator(lab_l, unlab_l, epoch=0, mode="cycle"))
        assert len(pairs) == unlab_l.steps_per_epoch()
        for lab_b, unlab_b in pairs:
            assert lab_b["image"].shape == unlab_b["image"].shape

    def test_pairing_changes_decay_timing(self):
        """Epoch length feeds the LR staircase: zip mode decays on the
        labeled-stream epoch count (reference cadence)."""
        from cyclegan_tpu.train.schedule import make_lambda_lr

        # 4 steps/epoch (zip) vs 12 (cycle): after 24 steps, zip has done 6
        # epochs, cycle 2 — different decay positions for epochs=8, decay@4.
        f_zip = make_lambda_lr(1.0, epochs=8, decay_epoch=4, steps_per_epoch=4)
        f_cycle = make_lambda_lr(1.0, epochs=8, decay_epoch=4, steps_per_epoch=12)
        assert float(f_zip(24)) == 0.5    # epoch 6 of 8, decay@4 -> 1 - 2/4
        assert float(f_cycle(24)) == 1.0  # epoch 2 -> before decay

    def test_grayscale_synthetic(self):
        ds = make_dataset("synthetic_gray", size=4)
        img, lab = ds.get(0)
        assert img.shape[-1] == 1 and lab.max() < 4


class TestResizeConvention:
    def test_fixed_resize_before_crop(self):
        """VERDICT round-1 missing item 4: both resize conventions work.
        With resize_hw set, every training image is resized there first, so
        crop statistics follow the torchvision Resize+RandomCrop pipeline."""
        from cyclegan_tpu.data.loader import Loader

        ds = make_dataset("synthetic", size=6)
        base = Loader(ds, batch_size=2, crop_hw=(32, 32), train=True, seed=0)
        resized = Loader(ds, batch_size=2, crop_hw=(32, 32), train=True,
                         seed=0, resize_hw=(64, 48))
        a = next(iter(base.epoch(0)))
        b = next(iter(resized.epoch(0)))
        assert a["image"].shape == b["image"].shape == (2, 32, 32, 3)
        # same seed, different source geometry -> different crops
        assert not np.array_equal(a["image"], b["image"])

    def test_runner_wires_resize(self):
        from cyclegan_tpu.train.runner import _make_loader
        from cyclegan_tpu.utils.config import Config

        ds = make_dataset("synthetic", size=4)
        cfg = Config(batch_size=2, crop_height=32, crop_width=32,
                     resize_height=80, resize_width=60)
        train_loader = _make_loader(cfg, ds, train=True, seed=0)
        assert train_loader.resize_hw == (80, 60)
        val_loader = _make_loader(cfg, ds, train=False, seed=0, drop_last=False)
        assert val_loader.resize_hw is None  # eval resizes to crop directly
