"""Native C++ data kernels vs numpy (bit-identical contract)."""

import numpy as np
import pytest

from cyclegan_tpu.data import native
from cyclegan_tpu.data.datasets import make_dataset
from cyclegan_tpu.data.loader import Loader

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_crop_flip_normalize_bit_identical():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40, 50, 3)).astype(np.uint8) for _ in range(4)]
    tops = np.array([0, 5, 2, 8]); lefts = np.array([3, 0, 7, 1])
    flips = np.array([0, 1, 0, 1], np.uint8)
    out = native.crop_flip_normalize_batch(imgs, tops, lefts, flips, (32, 32))
    ref = np.stack([
        ((im[t:t + 32, l:l + 32][:, ::-1] if f else im[t:t + 32, l:l + 32])
         .astype(np.float32) / 127.5 - 1.0)
        for im, t, l, f in zip(imgs, tops, lefts, flips)])
    np.testing.assert_array_equal(out, ref)


def test_label_batch_and_one_hot():
    rng = np.random.default_rng(1)
    labs = [rng.integers(0, 21, (40, 50)).astype(np.uint8) for _ in range(3)]
    tops = np.array([1, 0, 4]); lefts = np.array([0, 2, 3])
    flips = np.array([1, 0, 1], np.uint8)
    out = native.crop_flip_label_batch(labs, tops, lefts, flips, (16, 16))
    ref = np.stack([
        (lb[t:t + 16, l:l + 16][:, ::-1] if f else lb[t:t + 16, l:l + 16])
        .astype(np.int32)
        for lb, t, l, f in zip(labs, tops, lefts, flips)])
    np.testing.assert_array_equal(out, ref)
    oh = native.one_hot(ref, 21)
    from cyclegan_tpu.data.palette import one_hot as np_oh
    np.testing.assert_array_equal(oh, np_oh(ref, 21))


def test_loader_native_matches_numpy(monkeypatch):
    """Same seed -> identical batches through both pixel paths."""
    ds = make_dataset("synthetic", size=8)
    loader = Loader(ds, batch_size=4, crop_hw=(64, 64), train=True, seed=3)
    native_batch = next(iter(loader.epoch(0)))
    monkeypatch.setattr(native, "available", lambda: False)
    numpy_batch = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(native_batch["image"], numpy_batch["image"])
    np.testing.assert_array_equal(native_batch["label"], numpy_batch["label"])
