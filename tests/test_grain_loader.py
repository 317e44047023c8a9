"""Grain-backed loader option (SURVEY.md §1 L3 'tf.data or Grain pipeline')."""

import numpy as np

from cyclegan_tpu.data.datasets import make_dataset
from cyclegan_tpu.data.grain_loader import GrainLoader
from cyclegan_tpu.data.loader import paired_iterator


def test_shapes_and_determinism():
    ds = make_dataset("synthetic", size=10)
    loader = GrainLoader(ds, batch_size=4, crop_hw=(32, 32), train=True, seed=7)
    a = list(loader.epoch(0))
    b = list(loader.epoch(0))
    assert len(a) == loader.steps_per_epoch() == 2
    assert a[0]["image"].shape == (4, 32, 32, 3)
    assert a[0]["image"].dtype == np.float32
    assert a[0]["label"].shape == (4, 32, 32)
    np.testing.assert_array_equal(a[0]["image"], b[0]["image"])
    # different epoch -> different order/augments
    c = next(iter(loader.epoch(1)))
    assert not np.array_equal(a[0]["image"], c["image"])


def test_eval_mode_no_shuffle():
    ds = make_dataset("synthetic", split="val", size=6)
    loader = GrainLoader(ds, batch_size=2, crop_hw=(32, 32), train=False,
                         seed=0, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])


def test_paired_iterator_compat():
    ds = make_dataset("synthetic", size=12)
    lab = GrainLoader(ds, batch_size=2, crop_hw=(24, 24), train=True, seed=0)
    unlab = GrainLoader(ds, batch_size=2, crop_hw=(24, 24), train=True, seed=1)
    for mode in ("zip", "cycle"):
        pairs = list(paired_iterator(lab, unlab, epoch=0, mode=mode))
        assert len(pairs) == unlab.steps_per_epoch()  # equal-length streams


def test_short_final_batch_padded():
    """Mirrors Loader._pad_batch: eval batches keep one static shape."""
    ds = make_dataset("synthetic", split="val", size=5)
    loader = GrainLoader(ds, batch_size=2, crop_hw=(32, 32), train=False,
                         seed=0, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (2, 32, 32, 3)
        assert b["label"].shape == (2, 32, 32)
    # padding rows: zero image, 255 ignore label
    assert np.all(batches[-1]["label"][1] == 255)
    assert np.all(batches[-1]["image"][1] == 0)


def test_runner_factory_selects_grain():
    from cyclegan_tpu.train.runner import _make_loader
    from cyclegan_tpu.utils.config import Config

    ds = make_dataset("synthetic", size=4)
    cfg = Config(loader="grain", batch_size=2, crop_height=24, crop_width=24)
    loader = _make_loader(cfg, ds, train=True, seed=0)
    assert isinstance(loader, GrainLoader)
    batch = next(iter(loader.epoch(0)))
    assert batch["image"].shape == (2, 24, 24, 3)
